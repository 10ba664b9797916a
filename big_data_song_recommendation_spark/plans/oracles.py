"""DuckDB oracle SQL twins for :mod:`.queries`.

Dialect parity notes (the gotchas encoded below):

- DuckDB ``regexp_replace`` is first-match unless the ``'g'`` flag is
  passed; Spark replaces all occurrences. Every oracle regex carries
  ``'g'``.
- DuckDB numeric literals like ``5.0`` are DECIMAL; Spark's are double.
  CASE branches cast explicitly so output schemas line up.
- Timestamps are formatted to strings in both engines (Spark is
  session-TZ'd UTC, DuckDB naive-UTC).
- Computed floats are rounded identically on both sides.
"""

from __future__ import annotations

_NORMALIZED_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

_TOKEN_COUNT = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)

ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_top_orders_by_revenue": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q03_region_revenue": """
        SELECT r_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               COUNT(DISTINCT c_custkey) AS n_customers
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "q04_event_type_stats": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q05_top_events_per_type": """
        SELECT event_type, event_id, user_id, value, rnk
        FROM (
            SELECT event_type, event_id, user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC
                   ) AS rnk
            FROM events
        )
        WHERE rnk <= 3
        ORDER BY event_type, rnk
    """,
    "q06_orders_page": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders
        ORDER BY o_orderkey
        LIMIT 20 OFFSET 40
    """,
    "q07_active_customers": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
    "q08_inactive_customers": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        ORDER BY c_custkey
    """,
    "q09_value_buckets": """
        SELECT CASE WHEN value >= 80 THEN CAST(5.0 AS DOUBLE)
                    WHEN value >= 60 THEN CAST(4.0 AS DOUBLE)
                    WHEN value >= 40 THEN CAST(3.0 AS DOUBLE)
                    WHEN value >= 20 THEN CAST(2.0 AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE) END AS rating,
               COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value
        FROM events
        GROUP BY 1
        ORDER BY rating
    """,
    "q10_hourly_events": """
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY hour_ts
    """,
    "q11_union_order_classes": """
        SELECT bucket, o_orderstatus, COUNT(*) AS n
        FROM (
            SELECT 'high_value' AS bucket, o_orderstatus
            FROM orders WHERE o_totalprice > 50000
            UNION ALL
            SELECT 'recent' AS bucket, o_orderstatus
            FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        GROUP BY bucket, o_orderstatus
        ORDER BY bucket, o_orderstatus
    """,
    "q12_part_type_revenue": """
        SELECT p_type,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(AVG(p_retailprice), 2) AS avg_retail,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
        ORDER BY p_type
    """,
    "q13_props_json": """
        SELECT event_type,
               ROUND(AVG(k), 4) AS avg_k,
               MAX(k) AS max_k,
               MIN(k) AS min_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q14_doc_stats_by_lang": f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_tokens), 2) AS avg_tokens,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               MAX(n_chars) AS max_chars
        FROM (
            SELECT lang, n_chars, {_TOKEN_COUNT} AS n_tokens
            FROM documents
        )
        GROUP BY lang
        ORDER BY lang
    """,
    "q15_doc_exact_dedup": f"""
        SELECT doc_id, fp,
               (ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1) AS keep
        FROM (
            SELECT doc_id, md5({_NORMALIZED_TEXT}) AS fp
            FROM documents
        )
        ORDER BY doc_id
    """,
    "q16_knn_cosine": """
        WITH probes AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 3
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, label AS neighbor_label,
                   CAST(embedding AS DOUBLE[]) AS nv
            FROM embeddings
        ),
        scored AS (
            SELECT query_id, neighbor_id, neighbor_label,
                   ROUND(list_cosine_similarity(qv, nv), 6) AS sim
            FROM corpus, probes
            WHERE neighbor_id <> query_id
        )
        SELECT query_id, neighbor_id, neighbor_label, sim, rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC
                   ) AS rnk
            FROM scored
        )
        WHERE rnk <= 5
        ORDER BY query_id, rnk
    """,
}
