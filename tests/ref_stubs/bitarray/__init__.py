"""bitarray stub — referenced by the fork's Huffman-coded dataset, which
the parity path never exercises."""


class bitarray:  # noqa: N801
    def __init__(self, *a, **kw):
        raise NotImplementedError("bitarray stub")


class util:
    pass
