from .projector import apply_event_batch, parse_events
from .payloads import EVENT_SCHEMA, PARSED_SCHEMA
from .state_migration import migrate_state_file, starting_offsets_json

__all__ = [
    "apply_event_batch",
    "parse_events",
    "EVENT_SCHEMA",
    "PARSED_SCHEMA",
    "migrate_state_file",
    "starting_offsets_json",
]
