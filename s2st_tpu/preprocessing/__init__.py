"""Offline preprocessing tools (reference:
``examples/s2s_trans/preprocessing/`` — feature/manifest builders, text
normalization, data filtering, file splitting for parallel jobs)."""
