"""Shared utilities (layout conversion, logging)."""
