"""Repeated invocation of any registered query must leak no CacheManager
entries (the self-join queries materialize intermediates via eager
localCheckpoint, not persist; engine operators that do persist release or
document a caller-unpersist contract)."""


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_self_join_queries_leave_cache_empty(spark):
    from spider_go_spark.queries.textops import (
        containment_pairs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from spider_go_spark.queries.vectorops import embedding_near_dup_pairs

    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    for fn in (ngram_jaccard_pairs, minhash_lsh_pairs, simhash_near_pairs,
               embedding_near_dup_pairs, containment_pairs):
        for _ in range(2):  # repeated invocation — the leak class under test
            fn(spark, sf).count()
        assert _cache_empty(spark), f"{fn.__name__} leaked a CacheManager entry"
