from . import core, attention, transformer, tacotron, conformer  # noqa: F401
