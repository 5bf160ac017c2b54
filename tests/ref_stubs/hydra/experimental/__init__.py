def compose(*args, **kwargs):
    raise NotImplementedError("hydra stub: compose is not supported")


def initialize(*args, **kwargs):
    raise NotImplementedError("hydra stub: initialize is not supported")
