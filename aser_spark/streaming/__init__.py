from .ingest import (stream_extract_transcripts, streaming_dedup_turns,
                     streaming_turn_rates)
