"""LLM-data-pipeline operators (BASELINE.json mandate, SURVEY.md §2.2).

Training-data curation ops a 100 TB pipeline needs, all as DataFrame
transforms: exact + MinHash-LSH + SimHash + n-gram-Jaccard deduplication,
embedding similarity search (brute-force and LSH-bucketed ANN), text
analysis (token stats, quality scoring, language-ID features,
fingerprinting), and multimodal binary-column plumbing.

Determinism contract: all hashing is the *portable* sha256-based token hash
(``functions.text.token_hash64``) — identical integer results in Spark and
DuckDB — so every pipeline here is value-checkable against the SQL oracle,
unlike ``F.hash``/``xxhash64`` whose murmur internals DuckDB lacks.
"""
