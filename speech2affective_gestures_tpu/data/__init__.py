from . import motion_filter, preprocessor, ted_db, vocab  # noqa: F401
