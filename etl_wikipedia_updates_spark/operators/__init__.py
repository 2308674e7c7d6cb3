"""North-star operators for large-scale training-data pipelines.

- ``text``        tokenization, language-ID, quality scoring, fingerprinting
- ``dedup``       exact dedup, MinHash+LSH, SimHash near-dup
- ``similarity``  cosine top-k (brute force + IVF/blocked scale paths)
- ``multimodal``  opaque binary columns + Arrow-batched feature extraction

Design rule: every operator is a composition of built-in DataFrame ops
(JVM-side, codegen-friendly) unless the semantics genuinely require
Python — then it's an Arrow-batched ``mapInPandas``/``pandas_udf``,
never a row-at-a-time UDF.
"""
