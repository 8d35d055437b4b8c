from . import bvh, video  # noqa: F401
