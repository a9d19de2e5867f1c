"""esmarc_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
slub/esmarc (reference studied at /root/reference) as an idiomatic Spark
pipeline:

    S0 ingest       webtext table (url, warc_ts, html, text, lang)
    S1 extract      byte-identical text per url (vectorized Arrow UDF)
    S2 mentions     gazetteer mention detection (pandas UDF over Arrow batches)
    S3 link         broadcast-dictionary join mention -> authority id
    S4 canonicalize connected components over sameAs edges
    S5 materialize  (subj, pred, obj) JSON-LD triples, partitioned append

plus the declarative MARC21 field->schema.org mapping engine that the
reference's pytest fixtures exercise (see esmarc_spark.marc / .mapping).

Nothing in this package is a port of the reference's code: reference file:line
citations appear in docstrings only to document *semantics parity*.
"""

__version__ = "0.1.0"
