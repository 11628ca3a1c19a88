"""Data pipeline: list parsing, decode, clip sampling, preprocessing, loading."""
