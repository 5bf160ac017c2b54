"""omegaconf._utils stub (see package docstring)."""


def is_primitive_type(_):
    return True
