"""Arrow schemas for every logical table in the engine.

The reference is schemaless JSON (dsl_common.rb:38-62); here every table has a
fixed ``pyarrow`` schema so blocks stay zero-copy Arrow end-to-end
(``batch_format="pyarrow"`` everywhere; list<struct> span columns never pass
through pandas).
"""

from __future__ import annotations

import pyarrow as pa

# The interleaved-document payload (BASELINE.json input_hint):
# one row per extracted page; spans is the ordered text/media sequence.
SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # text | image | video | link
        ("text", pa.string()),       # text runs & anchor text ("" for media)
        ("media_ref", pa.string()),  # absolutized src/href ("" for text runs)
        ("offset", pa.int32()),      # document-order ordinal, 0-based
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),                 # canonical URL
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# The synthetic web ("the network") — FakePage analog (spec/fakeweb_helper.rb:27-93).
WEB_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),              # 200 | 301 | 404 | 401
        ("content_type", pa.string()),
        ("body", pa.large_binary()),
        ("redirect_to", pa.string()),        # "" unless 3xx
        ("latency_ms", pa.int32()),          # deterministic simulated latency
        ("auth", pa.string()),               # "user:pass" when basic-auth protected
        ("set_cookie", pa.string()),         # Set-Cookie response header ("" = none)
        ("fail_times", pa.int32()),          # first N attempts raise a transient
        #                                      error (Timeout/BadResponse/EOF model;
        #                                      the fetcher retries 3x, http.rb:211-216)
        ("require_cookie", pa.string()),     # "name=value" the request Cookie header
        #                                      must carry to see the real body; else a
        #                                      login stub is served ("" = public page)
    ]
)

# A crawl-frontier wave. parent_seq/ordinal give the deterministic
# BFS-with-priority total order (qless Ordered-reserver analog, driver.rb:95):
# a wave is ordered by (parent_seq, ordinal); seq is the global rank assigned
# once per wave (auto-increment id analog, driver.rb:122-137).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("referer", pa.string()),
        ("depth", pa.int32()),
        ("parent_seq", pa.int64()),
        ("ordinal", pa.int32()),
        ("seq", pa.int64()),
    ]
)

# Page metadata (page.rb:255-268 fields minus body; body never crosses a
# stage boundary — parse/extract fusion).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("code", pa.int32()),
        ("depth", pa.int32()),
        ("referer", pa.string()),
        ("redirect_to", pa.string()),
        ("response_time_ms", pa.int64()),
        ("fetched", pa.bool_()),
        ("error", pa.string()),
        ("fetch_time_ms", pa.int64()),   # virtual politeness clock timestamp
        ("seq", pa.int64()),
        ("wave", pa.int32()),
    ]
)

# Seen-set delta per wave (checkpoint unit).
SEEN_DELTA_SCHEMA = pa.schema([("canonical_url", pa.string()), ("wave", pa.int32())])

CRAWL_ORDER_SCHEMA = pa.schema(
    [("wave", pa.int32()), ("seq", pa.int64()), ("url", pa.string())]
)
