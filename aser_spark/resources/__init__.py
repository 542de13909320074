"""Packaged data resources (loaded via importlib.resources so the package
works from a --py-files zip): the frozen discourse classifier weights and
feature vocabularies (see scripts/freeze_discourse_models.py for
provenance — reference aser/extract/discourse/*, originally the public
Wang & Lan CoNLL-2015 discourse-parser resources)."""
