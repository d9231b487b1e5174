"""ner_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of RoryDoctective/NER
(reference at /root/reference, surveyed in SURVEY.md) as an idiomatic
Spark DataFrame pipeline:

    files (repo, path, commit, lang, content)
      -> normalize/tokenize          (Arrow-columnar, functions/text.py)
      -> gazetteer BIO mentions      (operators/mentions.py)
      -> entity linking              (operators/linking.py)
      -> canonicalization (CC)       (operators/components.py)
      -> (subj, pred, obj) triples   (operators/triples.py)

plus the reference's dictionary builders (operators/dictionary.py),
tag-level evaluation (operators/evaluate.py), Viterbi decode
(operators/viterbi.py), corpus sources (sources/), and the
training-data-pipeline operators a 100 TB corpus needs
(operators/dedup.py, operators/ann.py, functions/text.py).

Everything is DataFrame/Catalyst-first; Python appears only inside
vectorized pandas/Arrow UDFs (never per-row).
"""

__version__ = "0.1.0"

from ner_spark.session import get_spark  # noqa: F401
