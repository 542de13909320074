from .ingest import (stream_extract_transcripts,
                     streaming_conversation_sessions, streaming_dedup_turns,
                     streaming_turn_rates)
