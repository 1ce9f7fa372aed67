from . import arrays, multimodal, text
from .sql_registry import register_sql_functions

__all__ = ["arrays", "multimodal", "text", "register_sql_functions"]
