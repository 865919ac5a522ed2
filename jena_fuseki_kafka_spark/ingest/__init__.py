from .projector import apply_event_batch, parse_events
from .payloads import EVENT_SCHEMA, PARSED_SCHEMA

__all__ = ["apply_event_batch", "parse_events", "EVENT_SCHEMA", "PARSED_SCHEMA"]
