from . import arrays, bpe, multimodal, text
from .sql_registry import register_sql_functions

__all__ = ["arrays", "bpe", "multimodal", "text", "register_sql_functions"]
