from . import dsp, graph, pose, quaternions  # noqa: F401
