

def test_f1b_case_sensitive_verify(spark, tmp_path):
    """Engineered corpus pinning the index-path contract: the lowered
    token index generates candidates case-insensitively, the
    token_orig verify restores f1's case-SENSITIVE contains semantics,
    and within-token matches ("rehashing") are found."""
    from mirrulations_iceberg_spark.operators.relational import (
        indexed_substring_search,
    )
    from mirrulations_iceberg_spark.operators.text import build_token_index

    docs = spark.createDataFrame(
        [
            (1, "plain hash here", "en", 15),       # exact token
            (2, "rehashing the plan", "en", 18),    # within-token
            (3, "Hash only Capitalized", "en", 21), # candidate, verify rejects
            (4, "no match at all", "en", 15),
            (5, "HASHHASH shout", "en", 14),        # candidate, verify rejects
            (6, "mixed Hash and hash", "en", 19),   # one surface form passes
        ],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    idx_path = str(tmp_path / "idx")
    build_token_index(docs, with_original=True).write.parquet(idx_path)
    got = sorted(
        r.doc_id
        for r in indexed_substring_search(
            docs, spark.read.parquet(idx_path)
        ).collect()
    )
    want = sorted(
        r.doc_id for r in docs.filter(docs.text.contains("hash")).collect()
    )
    assert got == want == [1, 2, 6]
