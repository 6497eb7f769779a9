from .f1_model import F1_MODEL_CTE, combined, f1_results, weather_daily  # noqa: F401
