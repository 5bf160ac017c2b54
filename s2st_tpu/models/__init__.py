from . import s2st_transformer  # noqa: F401
