"""Fixed StructType schemas for every engine table.

The reference keeps all payloads as dynamically-typed JSON documents
(``map[string]interface{}`` — /root/reference/pkg/spider/workflow.go:104-111);
this engine replaces them with fixed columnar schemas (SURVEY.md §1.2).

The ``documents`` shape (doc_id + interleaved text/media spans) is the
authoritative input shape from BASELINE.json ``input_hint``. Span array
order is significant — the per-row invariant vs the reference is
span-sequence equality on (kind, text, media_ref, order).
"""

from __future__ import annotations

from pyspark.sql import types as T


def with_crawl_id(schema: T.StructType) -> T.StructType:
    """Tenant-scope a table schema: every engine-owned table carries a
    ``crawl_id`` column, ≙ the reference's per-workflow row scoping (every
    Mongo query filters by workflow id,
    /root/reference/pkg/spider/storage_workflow_mongodb.go:213-222). Base
    schemas stay crawl-agnostic — operators never see the column; the
    engine filters on read and stamps on write."""
    return T.StructType(
        [T.StructField("crawl_id", T.StringType(), False), *schema.fields]
    )

# --- interleaved text+media documents (input_hint, authoritative) ---------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # text | image | video | link
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# --- frontier: the pending-fetch queue -------------------------------------
# ≙ the reference's NATS `-input` stream of pending task messages
# (/root/reference/pkg/spider/nats.go:122-124). Partition by salt =
# host_hash % P so politeness windows shuffle once and hot hosts split.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # raw, as discovered
        T.StructField("url_norm", T.StringType(), False),  # canonical form
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url_norm)
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("parent_hash", T.LongType(), True),
        T.StructField("discovered_round", T.IntegerType(), False),
        # deterministic discovery order for tie-breaking: (parent's rank in
        # its round, index of this link in the parent's out_links)
        T.StructField("discovery_rank", T.LongType(), False),
    ]
)

# --- URL-seen set ----------------------------------------------------------
# ≙ Mongo composite unique indexes (storage_workflow_mongodb.go:81-119) +
# the NATS 2-minute Duplicates window (nats.go:161). Two tables: sharded
# Bloom bitmaps (fast pre-filter) + exact url_norm membership (ground truth).
SEEN_SHARDS = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("bloom_bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k_hashes", T.IntegerType(), False),
    ]
)

SEEN_URLS = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("seen_round", T.IntegerType(), False),
    ]
)

# --- per-host politeness/robots config -------------------------------------
# ≙ WorkerConfig/Config map (storage.go:90-97) + WorkflowAction.Disabled
# (action.go:12, dropped at workflow.go:100-102). Small → broadcast join.
HOST_POLICY = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("max_in_flight", T.IntegerType(), False),
        T.StructField("robots_txt", T.StringType(), True),
        T.StructField("disabled", T.BooleanType(), False),
        # revisit policy ≙ the reference's cron trigger re-scheduling work on
        # an interval (cmd/cron-trigger/main.go:82-229), expressed in round
        # granularity: a URL fetched in round r becomes eligible for refetch
        # in round r + revisit_after_rounds. NULL/0 = never refetch.
        T.StructField("revisit_after_rounds", T.IntegerType(), True),
    ]
)

# HOST_POLICY plus the optional 5-field cron revisit spec (≙ gocron specs,
# cmd/cron-trigger/main.go:149). The engine detects the column by name, so
# cron-less policies keep the narrower schema. Built as a NEW StructType —
# StructType.add() mutates in place, which must never touch the shared
# HOST_POLICY above.
HOST_POLICY_CRON = T.StructType(
    HOST_POLICY.fields + [T.StructField("cron", T.StringType(), True)]
)

# --- revisit queue: fetched URLs awaiting their recrawl round ---------------
# ≙ the cron-trigger's scheduled-job table. Bucketed like the frontier
# (pmod(url_hash, frontier_buckets)) so consuming/inserting rows is a
# partition-scoped rewrite.
REVISIT = T.StructType(
    [
        *FRONTIER.fields,
        # fetch attempts already consumed (retry-with-backoff entries carry
        # attempt ≥ 1; policy revisits reset to 0)
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("next_round", T.IntegerType(), False),
        # adaptive revisit (change detection): content hash seen at the last
        # successful fetch, and the interval that produced next_round.
        # last_hash is NULL on retry entries and under fixed-interval
        # (non-adaptive) policies, so the change comparison never fires;
        # interval is always populated (= the policy base under
        # non-adaptive policies, round_loop's fixed branch writes base_k).
        # Compat note: these two columns were added in round 2 — revisit
        # snapshots written by the round-1 schema cannot be read on resume;
        # the config-versioned crawl_id keys old snapshots away from new
        # engines, which is the intended mitigation.
        T.StructField("last_hash", T.LongType(), True),
        T.StructField("interval", T.IntegerType(), True),
    ]
)

# --- fetched documents (round output) --------------------------------------
# ≙ worker SendOutput values (worker.go:45-53); spans per input_hint.
FETCHED_DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("fetch_rank", T.LongType(), False),  # global order in round
        T.StructField("status", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("out_links", T.ArrayType(T.StringType()), False),
        # deterministic content fingerprint of the fetched body (change
        # detection input for the adaptive-revisit scheduler)
        T.StructField("content_hash", T.LongType(), False),
    ]
)

# --- lineage: discovery path -----------------------------------------------
# ≙ Mongo session contexts (storage_workflow_mongodb.go:751-757): which
# parent discovered which URL, in which round, processed by which partition.
LINEAGE = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("parent_hash", T.LongType(), True),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("rank_in_round", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
    ]
)

# --- synthetic web graph (deterministic fetcher input) ----------------------
WEB_GRAPH = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("out_links", T.ArrayType(T.StringType()), False),
        T.StructField("doc_template_id", T.IntegerType(), False),
    ]
)

# --- per-partition fetch metrics table (north rule: "per-partition lineage
# and fetch metrics in Iceberg"; aggregate round totals additionally go into
# the round_state checkpoint metadata) --------------------------------------
ROUND_METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_fetched", T.LongType(), False),
        T.StructField("n_ok", T.LongType(), False),
        T.StructField("n_links_out", T.LongType(), False),
    ]
)

# --- per-host failure circuit breaker state ---------------------------------
# one row per host currently carrying breaker information (a failure streak
# in progress, accumulated trips, or an unexpired quarantine); healthy hosts
# have no row. streak counts consecutive failed fetches with no intervening
# success (round-granular: a round with any 200 resets it); trips counts
# threshold crossings since the last success and drives the exponential
# cooldown; quarantined_until is the last round the host is still excluded
# from scheduling (-1 = never quarantined).
BREAKER = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("streak", T.IntegerType(), False),
        T.StructField("trips", T.IntegerType(), False),
        T.StructField("quarantined_until", T.IntegerType(), False),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)
