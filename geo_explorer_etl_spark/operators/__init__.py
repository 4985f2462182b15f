"""Relational + extension operators.

- ``joins``      — broadcast lookup joins, anti-join incrementals,
                   member cross-products, date fan-out, related top-k
                   (SURVEY.md §2.3).
- ``windows``    — sequential ID strategies, per-group ordinals,
                   keep-first dedup, top-k per group (§2.5–§2.6).
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram Jaccard
                   near-duplicate detection (extension).
- ``similarity`` — embedding cosine top-k, LSH-bucketed ANN (extension).
- ``text``       — language-ID, quality scores, token counts,
                   fingerprints (extension).
- ``multimodal`` — binary-column decode/feature plumbing (extension,
                   decode stubbed — codec libs not in container).
"""
