from . import normalize, resample, window  # noqa: F401
