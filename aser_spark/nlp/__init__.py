"""Deterministic NLP layer: tokenizer, tagger, lemmatizer, dependency parser.

The reference delegates parsing to a Stanford CoreNLP server over HTTP
(/root/reference/aser/extract/utils.py:195-277, parse_server.py:49-73) —
an external Java service that is neither available nor desirable inside
Spark executors.  We replace it with a self-contained deterministic
rule/lexicon parser that emits the same ``parsed_result`` shape (tokens,
lemmas, pos_tags, ners, dependencies sorted by (governor, dependent)).

The parser is intentionally small: it fully covers the template grammar of
the synthetic transcript corpus (aser_spark.datagen) and degrades gracefully
on arbitrary text.  Because BOTH the Spark pipeline and the vendored
reference oracle consume identical parses, extraction P/R is measured on
extraction semantics, not parsing quality.  Swapping in a real parser
(spaCy/stanza via --archives) only requires replacing `parse_text`.
"""

from .parser import parse_text, parse_sentence, split_sentences, tokenize
