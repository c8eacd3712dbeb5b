from uno_tpu.io.nl import read_nl, convert_nl_to_binary

__all__ = ["read_nl", "convert_nl_to_binary"]
