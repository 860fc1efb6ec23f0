"""Ray-Data-native schema + constraint validation engine.

Reimplements, from scratch and Ray-Data-first, the query / data-processing
capabilities of the reference QC pipeline ``mc2-center/cckp-toolkit-workflow``
(a Nextflow DSL2 per-record validation DAG: required-field presence, format
validity, content-acquisition checks, metric profiling, threshold-scored
criteria, per-record PASS/FAIL verdict vectors — see
``/root/reference/main.nf``, ``modules/*.nf``, ``bin/analyze_joss.py``),
applied to Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)`` at 10^12-document design scale.

Architecture (idiomatic Ray Data, not a port):

* one ``ray.data.Dataset`` per logical table; blocks are Arrow;
* every row-local check is a vectorized ``map_batches`` over
  ``batch_format="pyarrow"`` batches (zero-copy);
* stateful stages (HTML→text extraction validation, sketch accumulation)
  are actor pools (state built once per actor in ``__init__``);
* wide operations (url uniqueness) pre-aggregate per batch (combiner)
  before a hash-partitioned ``groupby`` so hot keys never concentrate;
* the engine never aborts on bad data — malformed rows become violation
  rows and FAIL/UNKNOWN verdicts (reference ``errorStrategy 'ignore'``
  semantics, ProcessRepo.nf:19 etc.); only an input whose *physical
  schema* mismatches the declared schema is rejected fail-fast
  (reference main.nf:49-66 analog).
"""

__version__ = "0.1.0"
