"""Minimal hydra stub for importing the reference fairseq fork in parity
tests. ConfigStore registration is a no-op; nothing in the parity path
composes hydra configs."""
