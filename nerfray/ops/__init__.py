"""Large-scale training-data pipeline operators over the driver's
``documents`` / ``embeddings`` / TPC-H-ish tables:

- ``dedup`` — exact / MinHash-LSH (+ distributed verify, survivors) /
  SimHash hamming-k
- ``similarity`` — cosine top-k, hyperplane-LSH & IVF ANN, n-gram
  Jaccard, embedding near-dup
- ``text`` — stats, quality, curation, language ID, word-DF, top-k
  words, winnowing fingerprints, PII redaction
- ``sampling`` — content-hash splits, stratified sampling, chunking
- ``joins`` — generic big-big hash join (inner / left outer / semi /
  anti), bucketed co-group + Acero
- ``sketch`` — HyperLogLog distinct (per-block register partials)
- ``relational`` — pruned reads, rollups, broadcast join, top-k,
  grouped exact quantiles, distinct-per-group, windowed top-N
- ``events`` — sessionize / hourly / sliding / as-of (hot-key-safe
  split variants)
- ``multimodal`` — binary-column plumbing (decode stubbed: no codecs
  in-sandbox)
"""
