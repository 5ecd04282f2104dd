"""Stateful model layer: builders + actor-pool scorer stages.

The analogue of LongQC's minimizer-index + overlap-scorer core
(T1–T6 in SURVEY.md §2.3): state built once, shared across records.
Here the state is three small deterministic models (langid NB,
char-trigram LM, toxicity lexicon) broadcast via ``ray.put`` and
loaded once per actor in ``__init__``.
"""
