"""Pure-Python extraction kernel.

This sub-package holds the CPU kernel that runs *inside* Arrow-batched
pandas UDFs on executors: ASER's syntactic eventuality patterns and the
seed-rule discourse-connective relation tagger. It has zero Spark
dependencies so it is unit-testable and shippable via --py-files.

Semantics are re-implemented from scratch against the published reference
algorithms (cited per function as /root/reference file:line); the data flow
and code structure are our own (pre-compiled opcode templates, batch loops).
"""

from .patterns import EVENTUALITY_PATTERNS, PATTERN_PROGRAMS, CLAUSE_SKIP_WORDS
from .extractor import extract_sentence_eventualities
from .relations import RELATION_SENSES, extract_paragraph_relations
