"""Evaluation: multi-clip score aggregation and the tag() inference entry."""
