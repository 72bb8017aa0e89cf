"""Native (C++) runtime helpers with pure-Python fallbacks."""

from i3rc_tpu.native.fastparse import parse_float_tokens, native_available

__all__ = ["parse_float_tokens", "native_available"]
