from .event_codec import EventSequenceEncoder, decode_tokens_to_midi, encode_midi_to_tokens  # noqa: F401
from .meta_parser import MetaParser, remove_number_from_inst  # noqa: F401
