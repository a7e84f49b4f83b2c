from mcport.utils.format import format_float, format_money, format_percent

__all__ = ["format_money", "format_percent", "format_float"]
