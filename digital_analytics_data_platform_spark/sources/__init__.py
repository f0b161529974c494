"""Batch sources/sinks beyond the CDC stream (SURVEY §2.1)."""

from .csv_upload import load_validated_csv, UploadValidationError
from .debezium import decode_envelopes, encode_envelopes, envelope_schema
from .manifest import FileManifest

__all__ = [
    "load_validated_csv",
    "UploadValidationError",
    "FileManifest",
    "decode_envelopes",
    "encode_envelopes",
    "envelope_schema",
]
