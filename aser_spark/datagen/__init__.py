from .transcripts import gen_conversation_rows, transcripts_df, TRANSCRIPT_SCHEMA
