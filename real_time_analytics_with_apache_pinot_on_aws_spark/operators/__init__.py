"""Engine operators beyond plain SQL surface.

- ``gapfill``     : time-series hole filling (SURVEY B34).
- ``dedup``       : exact + MinHash-LSH + SimHash + n-gram Jaccard near-dup (C1).
- ``similarity``  : embedding cosine top-k, brute force + LSH-bucketed ANN (C2).
- ``text``        : language-ID, quality scoring, token counts, fingerprint (C3).
- ``multimodal``  : binary-column plumbing with Arrow-batched decode UDFs (C4).
- ``textmatch``   : TEXT_MATCH inverted-index analog — postings + semi-join (B13).
- ``jsonindex``   : JSON_MATCH index analog — variant-flattened path/value postings (B14).
- ``sketch``      : mergeable HLL + KMV (theta-analog) sketches with set algebra (B20/B21).
- ``quantile_sketch``: DDSketch mergeable relative-error quantiles (B22 sketch form).
- ``asof``        : as-of join (latest prior match) as union + one window pass (C7).
- ``upsert``      : Pinot upsert-table analog — query-time latest-row resolution,
                    partial-upsert merge strategies, skew-salted aggregation (B62).
- ``funnel``      : FUNNEL_* aggregation family — ordered step matching per user (C8 kin).
- ``frequent``    : frequent-items (heavy-hitters) mergeable sketch with error bounds.
- ``clp``         : CLP log-message encoding (logtype/dictVars/encodedVars
                    columns) + CLPDECODE reassembly (B68).
- ``curation``    : corpus curation — benchmark decontamination, deterministic
                    train/val/test split, stratified sampling, sequence packing
                    (C10-C13); temperature rebalance / shards / token cap /
                    classifier (C19-C22); bigram-LM perplexity filter (C26),
                    DSIR selection (C27), Gopher rule gate (C28), C4 line
                    cleaning (C29), RefinedWeb URL/domain filter (C32).

All are DataFrame compositions of built-in functions unless noted; Python only
enters via Arrow-batched ``mapInPandas`` where semantics genuinely require it.
"""
