from .serde import Codec, Decoder

__all__ = ["Codec", "Decoder"]
