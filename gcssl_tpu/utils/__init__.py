"""Small shared utilities."""

from gcssl_tpu.utils.trees import count_params, tree_summary

__all__ = ["count_params", "tree_summary"]
