"""search_engine_ray — a Ray-Data-native full-text indexing and query engine.

A brand-new distributed rebuild of the capabilities of the reference
engine (Inquir-search/search-engine, a single-process in-memory TypeScript
search engine): analyzer chain, inverted-index construction, BM25 top-k
query engine — re-expressed as Ray Data pipelines (map_batches over Arrow
batches, actor pools for stateful analyzers, a sort/groupby shuffle for
posting-list construction, Parquet segments with lineage manifests).

Layout:
    analysis/     pure-Python analyzer/stemmer/langid/quality core (no Ray)
    sources/      synthetic corpus generators + pruned parquet readers
    index_build/  the distributed inverted-index build pipeline
    query/        BM25 query engine over built segments (block-max pruning)
    stages/       reusable Ray Data stages: dedup, similarity, aggregates,
                  windows, multimodal plumbing
    state/        global/per-segment statistics handling
    pipelines/    end-to-end flagship pipelines
"""

__version__ = "0.1.0"
