from .detok import tokens_to_text  # noqa: F401
from .timestamps import extract_timestamps  # noqa: F401
from .messages import extract_messages, extract_severity  # noqa: F401
