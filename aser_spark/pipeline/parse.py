"""Transcript text -> parsed sentence rows (S7/S1 of SURVEY.md §2.1).

The reference round-trips every sentence through an external CoreNLP java
server (utils.py:195-277); here parsing is an Arrow-batched ``mapInPandas``
flatMap — embarrassingly parallel, zero shuffle, scales with input splits.
"""

from __future__ import annotations

from ..schemas import PARSED_SENTENCE_SCHEMA


def _rows_for_turn(conv_id, turn_idx, text):
    from ..nlp import parse_text

    for sent_idx, p in enumerate(parse_text(text)):
        yield (
            conv_id, int(turn_idx), sent_idx, p["text"], p["tokens"],
            p["lemmas"], p["pos_tags"], p["ners"],
            [(g, r, d) for g, r, d in p["dependencies"]],
        )


def parse_transcripts(transcripts):
    """transcripts(conv_id, turn_idx, text, ...) -> parsed sentences DF."""
    import pandas as pd

    cols = [f.name for f in PARSED_SENTENCE_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            out = []
            for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                out.extend(_rows_for_turn(conv_id, turn_idx, text))
            yield pd.DataFrame(out, columns=cols)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=PARSED_SENTENCE_SCHEMA
    )
