from . import core, attention, transformer, tacotron  # noqa: F401
