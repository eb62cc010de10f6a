from .text import token_count_col, with_text_stats
from .similarity import cosine_topk, dot_col

__all__ = ["token_count_col", "with_text_stats", "cosine_topk", "dot_col"]
