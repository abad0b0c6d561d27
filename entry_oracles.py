"""DuckDB-oracle half of the driver contract: ``oracle_sql`` returns,
for each ``queries()`` key, ANSI SQL DuckDB runs over the same parquet
tables (plus fixture parquets for the non-SQL-expressible pipelines).
Split out of ``__spark_entry__.py``; import from ``__spark_entry__``.
"""

from __future__ import annotations

import os

_EN = "['the','and','of','to','in','is','that','with','for','was']"
_DE = "['der','die','und','das','ist','nicht','mit','ein','von','zu']"
_FR = "['le','la','les','et','des','est','une','dans','que','pour']"
_ES = "['el','la','los','que','de','en','una','es','por','con']"


def _zorder_sql(bits: int = 16) -> str:
    """Exact SQL replay of ``sources/io.py::zorder_key`` over
    events(value, user_id): identical rank-scale arithmetic (double
    subtraction/division/multiply in the same association order, FLOOR,
    clamp) and the same bit interleave — min/max are exact comparisons
    so both engines see identical doubles, making the 64-bit keys
    reproduce bit-for-bit."""
    m = (1 << bits) - 1

    def rank(col: str, j: int) -> str:
        span = f"(CASE WHEN s.mx{j} = s.mn{j} THEN 1.0 ELSE s.mx{j} - s.mn{j} END)"
        return (
            f"COALESCE(LEAST({m}, GREATEST(0, CAST(FLOOR("
            f"(CAST({col} AS DOUBLE) - s.mn{j}) / {span} * {m}"
            f") AS BIGINT))), 0)"
        )

    terms = " | ".join(
        f"(((r{j} >> {i}) & 1) << {2 * i + j})" for i in range(bits) for j in (0, 1)
    )
    return f"""
        WITH s AS (
          SELECT min(CAST(value AS DOUBLE)) AS mn0, max(CAST(value AS DOUBLE)) AS mx0,
                 min(CAST(user_id AS DOUBLE)) AS mn1, max(CAST(user_id AS DOUBLE)) AS mx1
          FROM events
        ), r AS (
          SELECT event_id, {rank('value', 0)} AS r0, {rank('user_id', 1)} AS r1
          FROM events, s
        )
        SELECT event_id, CAST({terms} AS BIGINT) AS zkey FROM r
    """


def oracle_sql() -> dict[str, str]:
    flags_cte = "keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X'))"
    # absolute path: the multimodal oracle reads a precomputed fixture
    # (independent pyarrow+numpy rendering of the deterministic fake
    # decode; regenerate with tests/fixtures/make_multimodal_fixture.py).
    # Fixtures are SF-KEYED: each covers sf0.001/0.01/0.1 with an
    # sf_key column (DuckDB content fingerprint of the source table);
    # the SQL selects the matching block and ERRORS when the table it
    # runs against matches no block, instead of silently comparing
    # another SF's rows.
    mm_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "multimodal_expected.parquet",
    )
    # same pattern for PCA: the eigendecomposition is not
    # SQL-expressible, so the oracle is an independent pyarrow+numpy
    # re-derivation (tests/fixtures/make_pca_fixture.py — same
    # covariance and sign conventions, no tumult_core_spark imports)
    pca_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "pca_expected.parquet",
    )
    # independent from-scratch BPE (train + encode) fixture — the merge
    # loop is iterative and not SQL-expressible
    # (tests/fixtures/make_bpe_fixture.py, pyarrow + stdlib only)
    bpe_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "bpe_expected.parquet",
    )
    # multimodal_decode: expected image stats computed DIRECTLY from
    # the deterministic pixel arrays with numpy — PNG never touched on
    # the oracle side, so the Spark query's real PNG encode->decode
    # round-trip is what the hash verifies
    # (tests/fixtures/make_png_fixture.py)
    png_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "png_expected.parquet",
    )
    # multimodal_jpeg: same pattern for the from-scratch baseline-JFIF
    # codec — expected stats computed directly from the deterministic
    # constant-block pixel arrays, JPEG never touched on the oracle
    # side (tests/fixtures/make_jpeg_fixture.py)
    jpeg_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "jpeg_expected.parquet",
    )
    # multimodal_flac: lossless audio round-trip — expected features
    # computed directly from the deterministic sample arrays, FLAC
    # never touched on the oracle side
    # (tests/fixtures/make_flac_fixture.py)
    flac_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "flac_expected.parquet",
    )
    # multimodal_gif / multimodal_video: same pattern — stats computed
    # from the a-priori pixel arrays, GIF/LZW and AVI/JPEG untouched on
    # the oracle side (tests/fixtures/make_gif_fixture.py,
    # make_video_fixture.py)
    gif_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "gif_expected.parquet",
    )
    tiff_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "tiff_expected.parquet",
    )
    video_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "video_expected.parquet",
    )
    # SF-keyed pinned constants (temperature_mix thresholds and the
    # dedup candidate-set cardinality regression pins) — deterministic
    # functions of the documents corpus, one block per shipped SF,
    # loud error() on an unknown corpus
    # (tests/fixtures/make_pinned_constants.py)
    pin_fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "pinned_constants.parquet",
    )
    # NOTE on integer sums: DuckDB sums integers into HUGEINT (int128),
    # which pandas silently converts to float64 and breaks the value
    # hash, so every integer-sum oracle is CAST(... AS BIGINT).  That
    # cast assumes the exact sum fits int64 — true with huge margin at
    # every shipped SF (clipped/boolean summands, <=1e7 rows) — but at
    # a vastly larger fixture DuckDB would raise on the cast while
    # Spark's long sum wraps (or throws under ANSI): a loud conversion
    # error on the oracle side, not a silent mismatch.
    return {
        "multimodal_features": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.f0, f.f1, f.f2, f.dim
            FROM '{mm_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('multimodal fixture has no block for this '
                              'documents table — regenerate with '
                              'tests/fixtures/make_multimodal_fixture.py')
                        AS BIGINT),
                   NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::INTEGER
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{mm_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_decode": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.width, f.height, f.channels, f.mean_value,
                   f.pos_checksum
            FROM '{png_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('png fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_png_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::INTEGER, NULL::INTEGER, NULL::DOUBLE,
                   NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{png_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_jpeg": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.width, f.height, f.channels, f.mean_value,
                   f.pos_checksum
            FROM '{jpeg_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('jpeg fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_jpeg_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::INTEGER, NULL::INTEGER, NULL::DOUBLE,
                   NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{jpeg_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_flac": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.f0, f.f1, f.f2, f.duration_ms
            FROM '{flac_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('flac fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_flac_fixture.py')
                        AS BIGINT),
                   NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, NULL::BIGINT
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{flac_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_gif": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.width, f.height, f.channels, f.mean_value,
                   f.pos_checksum
            FROM '{gif_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('gif fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_gif_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::INTEGER, NULL::INTEGER, NULL::DOUBLE,
                   NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{gif_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_tiff": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.width, f.height, f.channels, f.mean_value,
                   f.pos_checksum
            FROM '{tiff_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('tiff fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_tiff_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::INTEGER, NULL::INTEGER, NULL::DOUBLE,
                   NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{tiff_fixture}' WHERE sf_key = k.key)
        """,
        "multimodal_video": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, f.frame_index, f.width, f.height, f.mean_value,
                   f.pos_checksum
            FROM '{video_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('video fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_video_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::INTEGER, NULL::INTEGER, NULL::DOUBLE,
                   NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{video_fixture}' WHERE sf_key = k.key)
        """,
        # media_sniffing: full logic replay, no fixture — the payload
        # construction AND the ordered magic-rule chain are re-expressed
        # over hex(payload); rule order mirrors multimodal.MAGIC_RULES
        # (RIFF subtypes first, then the prefix rules)
        "media_sniffing": """
            WITH payloads AS (
              SELECT doc_id,
                CASE CAST(doc_id % 8 AS INTEGER)
                  WHEN 0 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB || encode(text)
                  WHEN 1 THEN '\\xFF\\xD8'::BLOB || encode(text)
                  WHEN 2 THEN 'GIF89a'::BLOB || encode(text)
                  WHEN 3 THEN 'fLaC'::BLOB || encode(text)
                  WHEN 4 THEN 'RIFF\\x00\\x00\\x00\\x00WAVE'::BLOB || encode(text)
                  WHEN 5 THEN 'RIFF\\x00\\x00\\x00\\x00AVI '::BLOB || encode(text)
                  WHEN 6 THEN '\\x00\\x00\\x00\\x18ftyp'::BLOB || encode(text)
                  ELSE encode(text)
                END AS payload
              FROM documents
            ), h AS (SELECT doc_id, hex(payload) AS hx FROM payloads)
            SELECT doc_id,
              CASE
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '57454250' THEN 'webp'
                WHEN left(hx, 16) = '89504E470D0A1A0A' THEN 'png'
                WHEN left(hx, 4) = 'FFD8' THEN 'jpeg'
                WHEN left(hx, 12) = '474946383761' THEN 'gif'
                WHEN left(hx, 12) = '474946383961' THEN 'gif'
                WHEN left(hx, 4) = '424D' THEN 'bmp'
                WHEN left(hx, 8) = '49492A00' THEN 'tiff'
                WHEN left(hx, 8) = '4D4D002A' THEN 'tiff'
                WHEN left(hx, 4) = '5036' THEN 'ppm'
                WHEN left(hx, 4) = '5035' THEN 'pgm'
                WHEN left(hx, 8) = '664C6143' THEN 'flac'
                WHEN left(hx, 18) = '595556344D50454732' THEN 'y4m'
                WHEN left(hx, 8) = '4F676753' THEN 'ogg'
                WHEN left(hx, 6) = '494433' THEN 'mp3'
                WHEN left(hx, 4) IN ('FFFB', 'FFF3', 'FFF2') THEN 'mp3'
                WHEN substr(hx, 9, 8) = '66747970' THEN 'mp4'
                WHEN left(hx, 8) = '25504446' THEN 'pdf'
                WHEN left(hx, 4) = '1F8B' THEN 'gzip'
                WHEN left(hx, 8) = '504B0304' THEN 'zip'
                ELSE 'unknown'
              END AS media_format,
              CASE
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'audio'
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'video'
                WHEN left(hx, 8) = '52494646' AND substr(hx, 17, 8) = '57454250' THEN 'image'
                WHEN left(hx, 16) = '89504E470D0A1A0A' THEN 'image'
                WHEN left(hx, 4) = 'FFD8' THEN 'image'
                WHEN left(hx, 12) = '474946383761' THEN 'image'
                WHEN left(hx, 12) = '474946383961' THEN 'image'
                WHEN left(hx, 4) = '424D' THEN 'image'
                WHEN left(hx, 8) = '49492A00' THEN 'image'
                WHEN left(hx, 8) = '4D4D002A' THEN 'image'
                WHEN left(hx, 4) = '5036' THEN 'image'
                WHEN left(hx, 4) = '5035' THEN 'image'
                WHEN left(hx, 8) = '664C6143' THEN 'audio'
                WHEN left(hx, 18) = '595556344D50454732' THEN 'video'
                WHEN left(hx, 8) = '4F676753' THEN 'audio'
                WHEN left(hx, 6) = '494433' THEN 'audio'
                WHEN left(hx, 4) IN ('FFFB', 'FFF3', 'FFF2') THEN 'audio'
                WHEN substr(hx, 9, 8) = '66747970' THEN 'video'
                WHEN left(hx, 8) = '25504446' THEN 'document'
                WHEN left(hx, 4) = '1F8B' THEN 'archive'
                WHEN left(hx, 8) = '504B0304' THEN 'archive'
                ELSE 'unknown'
              END AS media_type
            FROM h
        """,
        "pca_project": f"""
            WITH k AS (SELECT bit_xor(hash(vec_id, embedding)) AS key
                       FROM embeddings)
            SELECT f.vec_id, f.pc1, f.pc2
            FROM '{pca_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('pca fixture has no block for this embeddings '
                              'table — regenerate with '
                              'tests/fixtures/make_pca_fixture.py')
                        AS BIGINT),
                   NULL::DOUBLE, NULL::DOUBLE
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{pca_fixture}' WHERE sf_key = k.key)
        """,
        "rolling_aggregate": """
            SELECT event_id,
                   COUNT(*) OVER w AS rolling_count,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(38,12))) OVER w
                              AS DOUBLE), 6) AS rolling_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING
                               AND CURRENT ROW)
        """,
        "sessionize_batch": """
            WITH o AS (
                SELECT user_id, event_id, epoch_us(ts) AS t,
                       LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev
                FROM events),
            m AS (
                SELECT user_id, t,
                       SUM(CASE WHEN prev IS NULL
                                     OR t - prev > 1800000000
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id
                                 ORDER BY t, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM o)
            SELECT user_id, MIN(t) AS session_start_us,
                   MAX(t) AS session_end_us,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM m GROUP BY user_id, sid
        """,
        "preprocess_pipeline": """
            WITH RECURSIVE g AS (
                SELECT doc_id, text FROM documents WHERE n_chars >= 250),
            u AS (
                SELECT doc_id,
                       unnest(string_split(text, ' table ')) AS unit,
                       generate_subscripts(string_split(text, ' table '), 1)
                           - 1 AS pos
                FROM g),
            w AS (
                SELECT unit, MIN(doc_id * 1000000 + pos) AS win
                FROM u GROUP BY unit),
            k AS (
                SELECT u.doc_id, u.pos, u.unit,
                       (u.doc_id * 1000000 + u.pos) = w.win AS keep
                FROM u JOIN w ON u.unit = w.unit),
            dd AS (
                SELECT doc_id,
                       COALESCE(array_to_string(
                           list(unit ORDER BY pos) FILTER (WHERE keep),
                           ' table '), '') AS text
                FROM k GROUP BY doc_id),
            t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM dd),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           1) - 1 AS chunk_idx
                FROM t),
            d AS (
                SELECT doc_id * 1000 + chunk_idx AS chunk_id,
                       (doc_id * 1000 + chunk_idx) % 8 AS bucket,
                       LEAST(CASE WHEN chunk_text = '' THEN 0
                                  ELSE len(string_split(chunk_text, ' '))
                             END, 40) AS tok,
                       ROW_NUMBER() OVER (
                           PARTITION BY (doc_id * 1000 + chunk_idx) % 8
                           ORDER BY doc_id * 1000 + chunk_idx) AS rn
                FROM c),
            packed AS (
                SELECT bucket, rn, chunk_id, tok, 0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.chunk_id, x.tok,
                       CASE WHEN p.fill + x.tok > 40
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 40
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT chunk_id, bucket, bin FROM packed
        """,
        "bpe_tokens": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents)
            SELECT f.doc_id, CAST(f.n_bpe_tokens AS INTEGER) AS n_bpe_tokens,
                   array_to_string(f.bpe_tokens, ' ') AS bpe_tokens
            FROM '{bpe_fixture}' f, k WHERE f.sf_key = k.key
            UNION ALL
            SELECT CAST(error('bpe fixture has no block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_bpe_fixture.py')
                        AS BIGINT),
                   NULL::INTEGER, NULL::VARCHAR
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{bpe_fixture}' WHERE sf_key = k.key)
        """,
        "filter_select": (
            "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity < 25"
        ),
        "rename": "SELECT l_orderkey, l_returnflag AS flag FROM lineitem",
        "zorder_key": _zorder_sql(),
        "dict_pipeline": """
            SELECT l_orderkey, l_quantity, l_extendedprice AS price
            FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        """,
        "groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_count_distinct": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_distinct
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_sum": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_qty
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "substring_removal": """
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
              FROM documents
            ),
            wins AS (
              SELECT doc_id, g.i - 1 AS i,
                     array_to_string(t[g.i : g.i + 11], ' ') AS w
              FROM toks, UNNEST(generate_series(1, len(t) - 11)) AS g(i)
              WHERE len(t) >= 12
            ),
            dup AS (SELECT w FROM wins GROUP BY w HAVING min(doc_id) <> max(doc_id)),
            spans AS (SELECT doc_id, i AS s, i + 11 AS e FROM wins JOIN dup USING (w)),
            marked AS (
              SELECT doc_id, s, e,
                     CASE WHEN s > COALESCE(MAX(e) OVER (
                                    PARTITION BY doc_id ORDER BY s
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                                  ) + 1, -1)
                          THEN 1 ELSE 0 END AS ni
              FROM spans
            ),
            isl AS (
              SELECT doc_id, s, e,
                     SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              FROM marked
            ),
            merged AS (
              SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM isl GROUP BY doc_id, island
            ),
            tok_rows AS (
              SELECT doc_id, g.i - 1 AS i, t[g.i] AS tok
              FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
            )
            SELECT tr.doc_id,
                   COALESCE(string_agg(tr.tok, ' ' ORDER BY tr.i)
                            FILTER (WHERE NOT EXISTS (
                              SELECT 1 FROM merged m
                              WHERE m.doc_id = tr.doc_id
                                AND tr.i BETWEEN m.s AND m.e)), '') AS cleaned
            FROM tok_rows tr GROUP BY tr.doc_id
        """,
        "token_budget_mix": """
            -- verbatim replay of token_budget_thresholds + the Knuth
            -- mix (seed 7): target = budget * (1/k); frac = target /
            -- total; threshold = trunc(frac * 2^32) — same double-op
            -- order as the Python, so values match bit-for-bit
            WITH tot AS (
              SELECT source, CAST(SUM(n_chars) AS BIGINT) AS t
              FROM documents WHERE source IS NOT NULL GROUP BY 1
            ),
            thr AS (
              SELECT source,
                     CAST(FLOOR(LEAST(1.0,
                          (100000.0 * (1.0 / (SELECT COUNT(*) FROM tot)))
                          / CAST(t AS DOUBLE)) * 4294967296) AS BIGINT)
                       AS threshold
              FROM tot
            )
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN thr USING (source)
            WHERE (((1161830751 * CAST((((d.doc_id + 7) % 4294967296)
                     - ((d.doc_id + 7) % 4294967296) % 65536) / 65536 AS BIGINT))
                    % 65536) * 65536
                   + 1161830751 * (((d.doc_id + 7) % 4294967296) % 65536))
                  % 4294967296 < thr.threshold
        """,
        "substring_dedup": """
            WITH toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
              FROM documents
            ),
            wins AS (
              SELECT doc_id, g.i - 1 AS i,
                     array_to_string(t[g.i : g.i + 11], ' ') AS w
              FROM toks, UNNEST(generate_series(1, len(t) - 11)) AS g(i)
              WHERE len(t) >= 12
            ),
            dup AS (SELECT w FROM wins GROUP BY w HAVING min(doc_id) <> max(doc_id)),
            spans AS (SELECT doc_id, i AS s, i + 11 AS e FROM wins JOIN dup USING (w)),
            marked AS (
              SELECT doc_id, s, e,
                     CASE WHEN s > COALESCE(MAX(e) OVER (
                                    PARTITION BY doc_id ORDER BY s
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                                  ) + 1, -1)
                          THEN 1 ELSE 0 END AS ni
              FROM spans
            ),
            isl AS (
              SELECT doc_id, s, e,
                     SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              FROM marked
            )
            SELECT doc_id, CAST(MIN(s) AS BIGINT) AS span_start,
                   CAST(MAX(e) AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, island
        """,
        "adaptive_queries": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1),
            s AS (SELECT l_returnflag,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s
                  FROM lineitem
                  WHERE CAST(FLOOR(l_quantity) AS BIGINT) > 25 GROUP BY 1)
            SELECT k.l_returnflag,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS count,
                   CAST(COALESCE(s.s, 0) AS BIGINT) AS sum_hi
            FROM keys k LEFT JOIN c USING (l_returnflag)
                        LEFT JOIN s USING (l_returnflag)
        """,
        "composition_count_sum": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS count,
                   CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_qty
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "total_counts": """
            SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
                   (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM lineitem)) AS n_distinct
        """,
        "average": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50)) AS s,
                         COUNT(*) AS n
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag,
                   CAST(COALESCE(c.s, 0) - 25 * COALESCE(c.n, 0) AS DOUBLE)
                       / GREATEST(COALESCE(c.n, 0), 1) + 25 AS avg_qty
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "variance": """
            WITH b AS (SELECT LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50) - 25 AS d
                       FROM lineitem),
            s AS (SELECT SUM(d) AS sod, SUM(d * d) AS sos, COUNT(*) AS n FROM b)
            SELECT ROUND(CAST(sos AS DOUBLE) / n
                         - (CAST(sod AS DOUBLE) / n) * (CAST(sod AS DOUBLE) / n),
                         6) AS var_qty
            FROM s
        """,
        "streaming_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "json_extract": """
            SELECT event_type,
                   COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS n_with_k,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS min_k,
                   MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS max_k
            FROM events GROUP BY 1
        """,
        "embedding_outliers": """
            WITH e AS (SELECT vec_id, label,
                              generate_subscripts(embedding, 1) AS pos,
                              CAST(unnest(embedding) AS DOUBLE) AS val
                       FROM embeddings),
            c AS (SELECT label, pos, AVG(val) AS m FROM e GROUP BY 1, 2),
            d AS (SELECT e.vec_id, e.label,
                         SUM((e.val - c.m) * (e.val - c.m)) AS ss
                  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
                  GROUP BY 1, 2)
            SELECT vec_id, label, ROUND(SQRT(ss), 6) AS centroid_dist FROM d
        """,
        "pagerank": """
            WITH raw AS (SELECT DISTINCT c_custkey * 2 AS u,
                                         c_nationkey * 2 + 1 AS v
                         FROM customer),
            e AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),
            deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM deg),
            r0 AS (SELECT u AS node, 1.0 / nn AS r FROM deg, n),
            c1 AS (SELECT e.v AS node, SUM(r0.r / deg.d) AS m
                   FROM e JOIN r0 ON e.u = r0.node JOIN deg ON e.u = deg.u
                   GROUP BY 1),
            r1 AS (SELECT r0.node,
                          (1.0 - 0.85) / nn + 0.85 * COALESCE(c1.m, 0) AS r
                   FROM r0 LEFT JOIN c1 USING (node), n),
            c2 AS (SELECT e.v AS node, SUM(r1.r / deg.d) AS m
                   FROM e JOIN r1 ON e.u = r1.node JOIN deg ON e.u = deg.u
                   GROUP BY 1),
            r2 AS (SELECT r1.node,
                          (1.0 - 0.85) / nn + 0.85 * COALESCE(c2.m, 0) AS r
                   FROM r1 LEFT JOIN c2 USING (node), n),
            c3 AS (SELECT e.v AS node, SUM(r2.r / deg.d) AS m
                   FROM e JOIN r2 ON e.u = r2.node JOIN deg ON e.u = deg.u
                   GROUP BY 1),
            r3 AS (SELECT r2.node,
                          (1.0 - 0.85) / nn + 0.85 * COALESCE(c3.m, 0) AS r
                   FROM r2 LEFT JOIN c3 USING (node), n)
            SELECT node, ROUND(r * nn, 6) AS rank_scaled FROM r3, n
        """,
        "hll_distinct": """
            -- the sketch estimate itself is Spark-side (DataSketches
            -- HLL, not replayable in DuckDB); the oracle replays the
            -- EXACT distinct count and the literal TRUE that the
            -- query computes as |estimate - exact| <= 2% * exact —
            -- a broken or drifting sketch flips the boolean and the
            -- value hash
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                   TRUE AS hll_ok
            FROM events GROUP BY 1
            UNION ALL
            SELECT '__all__', COUNT(DISTINCT user_id), TRUE FROM events
        """,
        "approx_quantile_check": """
            -- the percentile_approx estimate is Spark-side (GK-style
            -- mergeable summary); the oracle replays the exact count
            -- per (group, probability) and the literal TRUE the query
            -- computes as the rank-window contract check
            SELECT event_type, p.prob, COUNT(*) AS n, TRUE AS rank_ok
            FROM events,
                 (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE,
                                 0.75::DOUBLE]) AS prob) p
            GROUP BY 1, 2
        """,
        "fused_moments": """
            WITH keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            b AS (SELECT l_returnflag,
                         LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0),
                               50) - 25 AS d
                  FROM lineitem),
            s AS (SELECT l_returnflag, SUM(d) AS sod, SUM(d * d) AS sos,
                         COUNT(*) AS n
                  FROM b GROUP BY 1),
            f AS (SELECT k.l_returnflag,
                         CAST(COALESCE(sod, 0) AS DOUBLE) AS sod,
                         CAST(COALESCE(sos, 0) AS DOUBLE) AS sos,
                         GREATEST(COALESCE(n, 0), 1) AS n
                  FROM keys k LEFT JOIN s USING (l_returnflag)),
            v AS (SELECT l_returnflag, sod / n AS ratio,
                         GREATEST(sos / n - (sod / n) * (sod / n), 0.0) AS var
                  FROM f)
            SELECT l_returnflag,
                   ROUND(ratio + 25.0, 6) AS avg_qty,
                   ROUND(var, 6) AS var_qty,
                   ROUND(SQRT(var), 6) AS std_qty
            FROM v
        """,
        "variance_intermediates": """
            WITH keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            b AS (SELECT l_returnflag,
                         LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0),
                               50) - 25 AS d
                  FROM lineitem),
            s AS (SELECT l_returnflag, SUM(d) AS sod, SUM(d * d) AS sos,
                         COUNT(*) AS n
                  FROM b GROUP BY 1)
            SELECT k.l_returnflag,
                   ROUND(CASE WHEN COALESCE(n, 0) = 0 THEN 0.0
                              ELSE GREATEST(CAST(sos AS DOUBLE) / n
                                            - (CAST(sod AS DOUBLE) / n)
                                              * (CAST(sod AS DOUBLE) / n),
                                            0.0)
                         END, 6) AS var_qty,
                   CAST(COALESCE(sod, 0) AS BIGINT) AS sod_qty,
                   CAST(COALESCE(sos, 0) AS BIGINT) AS sos_qty,
                   CAST(COALESCE(n, 0) AS BIGINT) AS n
            FROM keys k LEFT JOIN s USING (l_returnflag)
        """,
        "public_join": """
            SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "private_join_drop": """
            WITH lk AS (SELECT l_orderkey AS okey, l_linenumber FROM lineitem),
            ok AS (SELECT o_orderkey AS okey, o_orderpriority FROM orders),
            keep_l AS (SELECT okey FROM lk GROUP BY okey HAVING COUNT(*) <= 4),
            keep_r AS (SELECT okey FROM ok GROUP BY okey HAVING COUNT(*) <= 2)
            SELECT lk.okey, lk.l_linenumber, ok.o_orderpriority
            FROM lk JOIN keep_l USING (okey) JOIN ok USING (okey) JOIN keep_r USING (okey)
        """,
        "limit_rows_per_group": """
            SELECT l_orderkey, CAST(LEAST(COUNT(*), 3) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        """,
        "limit_rows_per_key_per_group": """
            WITH c AS (SELECT l_returnflag, l_orderkey, COUNT(*) AS c
                       FROM lineitem GROUP BY 1, 2)
            SELECT l_returnflag, CAST(SUM(LEAST(c, 2)) AS BIGINT) AS n
            FROM c GROUP BY 1
        """,
        "private_join_on_key": """
            SELECT o.o_custkey AS custkey, o.o_orderkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "groupby_stddev": """
            WITH keys(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            b AS (SELECT l_returnflag,
                         LEAST(GREATEST(CAST(FLOOR(l_quantity) AS BIGINT), 0), 50) - 25 AS d
                  FROM lineitem),
            s AS (SELECT l_returnflag, SUM(d) AS sod, SUM(d * d) AS sos,
                         COUNT(*) AS n
                  FROM b GROUP BY 1),
            j AS (SELECT k.l_returnflag,
                         COALESCE(s.sod, 0) AS sod, COALESCE(s.sos, 0) AS sos,
                         GREATEST(COALESCE(s.n, 0), 1) AS n
                  FROM keys k LEFT JOIN s USING (l_returnflag))
            SELECT l_returnflag,
                   ROUND(SQRT(GREATEST(
                       CAST(sos AS DOUBLE) / n
                       - (CAST(sod AS DOUBLE) / n) * (CAST(sod AS DOUBLE) / n),
                       0)), 6) AS std_qty
            FROM j
        """,
        "quantile_median": """
            WITH vals AS (
                SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v,
                       COUNT(*) AS c
                FROM lineitem GROUP BY 1, 2),
            ranked AS (
                SELECT g, v, c,
                       COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
                       SUM(c) OVER (PARTITION BY g) AS n
                FROM vals),
            intervals AS (
                SELECT g, LEAST(GREATEST(v, 0.0), 50.0) AS lo,
                       COALESCE(LEAD(LEAST(GREATEST(v, 0.0), 50.0))
                           OVER (PARTITION BY g ORDER BY v), 50.0) AS hi,
                       before + c AS rank, n
                FROM ranked
                UNION ALL
                SELECT g, 0.0 AS lo, MIN(LEAST(GREATEST(v, 0.0), 50.0)) AS hi,
                       0 AS rank, MAX(n) AS n
                FROM ranked GROUP BY g)
            SELECT g AS l_returnflag, lo AS q_lo, hi AS q_hi
            FROM intervals WHERE hi > lo
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY g
                ORDER BY ABS(rank - 0.5 * n) ASC, lo DESC) = 1
        """,
        "sessionize": """
            WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            f AS (SELECT user_id, ts,
                         CASE WHEN LAG(ts) OVER w IS NULL
                                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END AS brk
                  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT user_id,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM f)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "quality_scores": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            m AS (
                SELECT doc_id,
                       CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                       CAST(len(toks) AS DOUBLE) AS n_tokens,
                       CAST(LENGTH(regexp_replace(text, '[\\w\\s]', '', 'g'))
                            AS DOUBLE) AS n_punct,
                       CAST(len(list_filter(list_distinct(toks),
                           x -> list_contains(
                               ['the','and','of','to','in','is','that','with','for','was'],
                               x))) AS DOUBLE) AS n_stop
                FROM t)
            SELECT m.doc_id,
                   ROUND(
                       LEAST(n_chars / 1000.0, 1.0) * 0.3
                       + (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 3
                                    AND n_chars / GREATEST(n_tokens, 1.0) <= 12
                               THEN 1.0 ELSE 0.3 END) * 0.2
                       + (CASE WHEN n_punct / GREATEST(n_chars, 1.0) < 0.2 THEN 1.0
                               ELSE GREATEST(1.0 - (n_punct / GREATEST(n_chars, 1.0)
                                                    - 0.2) * 2, 0.0) END) * 0.2
                       + LEAST(n_stop / GREATEST(LEAST(n_tokens, 10.0), 1.0),
                               1.0) * 0.3,
                       6) AS quality
            FROM m
        """,
        "tfidf_top_terms": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            tfc AS (
                SELECT doc_id, unnest(toks) AS term FROM t),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM tfc GROUP BY 1, 2),
            dfreq AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT COUNT(*) AS nn FROM documents),
            scored AS (
                SELECT doc_id, term, tf, df,
                       tf * (ln((nn + 1) / (df + 1)) + 1.0) AS score
                FROM tf JOIN dfreq USING (term) CROSS JOIN n)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, ROUND(score, 6) AS score
            FROM scored
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC) <= 3
        """,
        "temperature_mix": f"""
            -- thresholds = temperature-2 mixing rule over this
            -- corpus's lang histogram, recomputed independently per SF
            -- by tests/fixtures/make_pinned_constants.py and keyed on
            -- the documents fingerprint (loud error on unknown corpus)
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents),
            thr AS (SELECT p.key AS lang, p.value AS threshold
                    FROM '{pin_fixture}' p, k
                    WHERE p.sf_key = k.key AND p.name = 'temperature_mix')
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr t ON d.lang = t.lang
            WHERE (((922480359 * CAST((((d.doc_id + 11) % 4294967296) - ((d.doc_id + 11) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 922480359 * (((d.doc_id + 11) % 4294967296) % 65536)) % 4294967296 < t.threshold
            UNION ALL
            SELECT CAST(error('pinned-constants fixture has no '
                              'temperature_mix block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_pinned_constants.py')
                        AS BIGINT),
                   NULL::VARCHAR
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{pin_fixture}'
                                       WHERE sf_key = k.key AND name = 'temperature_mix')
        """,
        "unigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            occ AS (SELECT doc_id, unnest(toks) AS term FROM t),
            freqs AS (SELECT term, COUNT(*) AS tf FROM occ GROUP BY 1),
            total AS (SELECT COUNT(*) AS tt FROM occ)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(AVG(ln(tf / tt)), 6) AS avg_logprob
            FROM occ JOIN freqs USING (term) CROSS JOIN total
            GROUP BY doc_id
        """,
        "weighted_sample": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            m AS (
                SELECT doc_id,
                       CAST(LENGTH(text) AS DOUBLE) AS n_chars,
                       CAST(len(toks) AS DOUBLE) AS n_tokens,
                       CAST(LENGTH(regexp_replace(text, '[\\w\\s]', '', 'g'))
                            AS DOUBLE) AS n_punct,
                       CAST(len(list_filter(list_distinct(toks),
                           x -> list_contains(
                               ['the','and','of','to','in','is','that','with','for','was'],
                               x))) AS DOUBLE) AS n_stop
                FROM t),
            q AS (
                SELECT doc_id,
                       LEAST(n_chars / 1000.0, 1.0) * 0.3
                       + (CASE WHEN n_chars / GREATEST(n_tokens, 1.0) >= 3
                                    AND n_chars / GREATEST(n_tokens, 1.0) <= 12
                               THEN 1.0 ELSE 0.3 END) * 0.2
                       + (CASE WHEN n_punct / GREATEST(n_chars, 1.0) < 0.2 THEN 1.0
                               ELSE GREATEST(1.0 - (n_punct / GREATEST(n_chars, 1.0)
                                                    - 0.2) * 2, 0.0) END) * 0.2
                       + LEAST(n_stop / GREATEST(LEAST(n_tokens, 10.0), 1.0),
                               1.0) * 0.3 AS quality
                FROM m)
            SELECT doc_id, ROUND(quality, 6) AS quality FROM q
            WHERE (((204429183 * CAST((((doc_id + 23) % 4294967296) - ((doc_id + 23) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 204429183 * (((doc_id + 23) % 4294967296) % 65536)) % 4294967296
                  < CAST(FLOOR(LEAST(GREATEST(quality, 0.0), 1.0)
                               * 4294967296.0) AS BIGINT)
        """,
        "fuzzy_join": """
            WITH typos AS (
                SELECT c_custkey + 1000000 AS t_id,
                       substring(c_name, 1, c_custkey % length(c_name))
                       || substring(c_name, c_custkey % length(c_name) + 2)
                           AS t_name
                FROM customer WHERE c_custkey < 200)
            SELECT c.c_custkey, t.t_id,
                   CAST(levenshtein(c.c_name, t.t_name) AS BIGINT) AS distance
            FROM customer c CROSS JOIN typos t
            WHERE levenshtein(c.c_name, t.t_name) <= 1
        """,
        "chunk_documents": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           1) - 1 AS chunk_idx
                FROM t)
            SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text,
                   CAST(CASE WHEN chunk_text = '' THEN 0
                             ELSE len(string_split(chunk_text, ' '))
                        END AS INTEGER) AS chunk_tokens
            FROM c
        """,
        "profile_numeric": """
            WITH m AS (SELECT COUNT(*) AS n FROM lineitem)
            SELECT col AS column, n AS n_rows, n_nulls,
                   ROUND(mn, 6) AS min, ROUND(mx, 6) AS max,
                   ROUND(mean, 6) AS mean
            FROM m, (
                SELECT 'l_quantity' AS col,
                       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_nulls,
                       CAST(MIN(l_quantity) AS DOUBLE) AS mn,
                       CAST(MAX(l_quantity) AS DOUBLE) AS mx,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_quantity) AS mean FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice',
                       CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                            AS BIGINT),
                       CAST(MIN(l_extendedprice) AS DOUBLE),
                       CAST(MAX(l_extendedprice) AS DOUBLE),
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_extendedprice) FROM lineitem
                UNION ALL
                SELECT 'l_discount',
                       CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
                            AS BIGINT),
                       CAST(MIN(l_discount) AS DOUBLE),
                       CAST(MAX(l_discount) AS DOUBLE),
                       CAST(SUM(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE)
                           / COUNT(l_discount) FROM lineitem
            )
        """,
        "chunk_pack": """
            WITH RECURSIVE t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            c AS (
                SELECT doc_id,
                       unnest(list_transform(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           s -> COALESCE(array_to_string(
                               list_slice(toks, s, s + 39), ' '), ''))) AS chunk_text,
                       generate_subscripts(
                           list_filter(
                               range(1, greatest(len(toks), 1) + 1, 30),
                               s -> s = 1 OR s <= len(toks) - 10),
                           1) - 1 AS chunk_idx
                FROM t),
            d AS (
                SELECT doc_id * 1000 + chunk_idx AS chunk_id,
                       (doc_id * 1000 + chunk_idx) % 8 AS bucket,
                       LEAST(CASE WHEN chunk_text = '' THEN 0
                                  ELSE len(string_split(chunk_text, ' '))
                             END, 40) AS tok,
                       ROW_NUMBER() OVER (
                           PARTITION BY (doc_id * 1000 + chunk_idx) % 8
                           ORDER BY doc_id * 1000 + chunk_idx) AS rn
                FROM c),
            packed AS (
                SELECT bucket, rn, chunk_id, tok, 0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.chunk_id, x.tok,
                       CASE WHEN p.fill + x.tok > 40
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 40
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT chunk_id, bucket, bin FROM packed
        """,
        "asof_join": """
            SELECT l.event_id, l.user_id,
                   epoch_us(l.ts) AS ts_us,
                   epoch_us(r.ts) AS err_ts_us,
                   r.value AS err_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'error') r
            ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "time_rollup": """
            SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "repetition_stats": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents),
            items AS (
                SELECT doc_id, 'L' AS kind, unnest(lines) AS item FROM t
                UNION ALL
                SELECT doc_id, 'B' AS kind,
                       unnest(list_transform(range(1, greatest(len(toks), 1)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS item
                FROM t
                UNION ALL
                SELECT doc_id, 'T' AS kind,
                       unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                                             i -> toks[i] || ' ' || toks[i+1]
                                                  || ' ' || toks[i+2])) AS item
                FROM t),
            counted AS (
                SELECT doc_id, kind, item, COUNT(*) AS cnt
                FROM items GROUP BY 1, 2, 3),
            per_kind AS (
                SELECT doc_id, kind,
                       SUM(cnt) AS total,
                       COUNT(*) AS distinct_n,
                       SUM(cnt * length(item)) AS total_chars,
                       SUM(CASE WHEN cnt > 1 THEN cnt * length(item)
                                ELSE 0 END) AS dup_chars,
                       -- chars of the MOST FREQUENT item (argmax by
                       -- count, ties to larger coverage) -- Gopher's
                       -- rule, mirrored from text.py's max_by
                       MAX(CASE WHEN cnt = mc THEN cnt * length(item)
                                END) AS top_chars
                FROM (SELECT counted.*,
                             MAX(cnt) OVER (PARTITION BY doc_id, kind) AS mc
                      FROM counted) GROUP BY 1, 2),
            stats AS (
                SELECT doc_id,
                       CAST(MAX(CASE WHEN kind = 'L' THEN total END) AS BIGINT)
                           AS n_lines,
                       CAST((MAX(CASE WHEN kind = 'L' THEN total END)
                             - MAX(CASE WHEN kind = 'L' THEN distinct_n END))
                            AS DOUBLE)
                           / MAX(CASE WHEN kind = 'L' THEN total END)
                           AS dup_line_frac,
                       CAST(MAX(CASE WHEN kind = 'L' THEN dup_chars END)
                            AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'L'
                                               THEN total_chars END), 1)
                           AS dup_line_char_frac,
                       COALESCE(CAST(MAX(CASE WHEN kind = 'B' THEN top_chars END)
                                     AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'B'
                                               THEN total_chars END), 1), 0.0)
                           AS top_bigram_char_frac,
                       COALESCE(CAST(MAX(CASE WHEN kind = 'T' THEN dup_chars END)
                                     AS DOUBLE)
                           / GREATEST(MAX(CASE WHEN kind = 'T'
                                               THEN total_chars END), 1), 0.0)
                           AS dup_trigram_char_frac
                FROM per_kind GROUP BY 1),
            sym AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\.{3}|…|#'))
                            AS DOUBLE)
                           / GREATEST(len(list_filter(
                                 string_split_regex(lower(text), '\\s+'),
                                 x -> x <> '')), 1) AS symbol_word_ratio
                FROM documents)
            SELECT s.doc_id, s.n_lines,
                   ROUND(s.dup_line_frac, 6) AS dup_line_frac,
                   ROUND(s.dup_line_char_frac, 6) AS dup_line_char_frac,
                   ROUND(s.top_bigram_char_frac, 6) AS top_bigram_char_frac,
                   ROUND(s.dup_trigram_char_frac, 6) AS dup_trigram_char_frac,
                   ROUND(y.symbol_word_ratio, 6) AS symbol_word_ratio,
                   (s.dup_line_frac <= 0.30 AND s.dup_line_char_frac <= 0.20
                    AND s.top_bigram_char_frac <= 0.20
                    AND s.dup_trigram_char_frac <= 0.30
                    AND y.symbol_word_ratio <= 0.10) AS keep
            FROM stats s JOIN sym y USING (doc_id)
        """,
        # total_pairs values below are regression pins: the full
        # candidate/pair set is not SQL-expressible (it depends on the
        # minhash/simhash signatures), but it IS a deterministic,
        # partition-invariant function of the corpus, verified by
        # re-running under different parallelism.  A recall or
        # over-generation change anywhere in the corpus flips them.
        # SF-keyed via the pinned-constants fixture (one value per
        # shipped SF; loud error on an unknown corpus).
        "dedup_minhash": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents),
            pin AS (SELECT p.value AS total_pairs FROM '{pin_fixture}' p, k
                    WHERE p.sf_key = k.key AND p.name = 'dedup_minhash')
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(pin.total_pairs AS BIGINT) AS total_pairs
            FROM documents, pin WHERE doc_id < 50
            UNION ALL
            SELECT CAST(error('pinned-constants fixture has no '
                              'dedup_minhash block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_pinned_constants.py')
                        AS BIGINT),
                   NULL::BIGINT, NULL::BIGINT
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{pin_fixture}'
                                       WHERE sf_key = k.key AND name = 'dedup_minhash')
        """,
        "dedup_simhash": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents),
            pin AS (SELECT p.value AS total_pairs FROM '{pin_fixture}' p, k
                    WHERE p.sf_key = k.key AND p.name = 'dedup_simhash')
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(pin.total_pairs AS BIGINT) AS total_pairs
            FROM documents, pin WHERE doc_id < 50
            UNION ALL
            SELECT CAST(error('pinned-constants fixture has no '
                              'dedup_simhash block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_pinned_constants.py')
                        AS BIGINT),
                   NULL::BIGINT, NULL::BIGINT
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{pin_fixture}'
                                       WHERE sf_key = k.key AND name = 'dedup_simhash')
        """,
        "ngram_jaccard": f"""
            WITH k AS (SELECT bit_xor(hash(doc_id, text)) AS key FROM documents),
            pin AS (SELECT p.value AS total_pairs FROM '{pin_fixture}' p, k
                    WHERE p.sf_key = k.key AND p.name = 'ngram_jaccard')
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(pin.total_pairs AS BIGINT) AS total_pairs
            FROM documents, pin WHERE doc_id < 100
            UNION ALL
            SELECT CAST(error('pinned-constants fixture has no '
                              'ngram_jaccard block for this documents '
                              'table — regenerate with '
                              'tests/fixtures/make_pinned_constants.py')
                        AS BIGINT),
                   NULL::BIGINT, NULL::BIGINT
            FROM k WHERE NOT EXISTS (SELECT 1 FROM '{pin_fixture}'
                                       WHERE sf_key = k.key AND name = 'ngram_jaccard')
        """,
        "limit_keys_per_group": """
            SELECT o_custkey, CAST(LEAST(COUNT(DISTINCT o_orderkey), 2) AS BIGINT) AS n_keys
            FROM orders GROUP BY 1
        """,
        "partition_selection": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS count
            FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= 20
        """,
        "bounds": """
            WITH bins AS (
                SELECT CAST(LEAST(GREATEST(
                    CASE WHEN l_partkey = 0 THEN 0
                         ELSE CEIL(LOG2(ABS(CAST(l_partkey AS DOUBLE)))) END,
                    0), 62) AS INTEGER) AS r, COUNT(*) AS n
                FROM lineitem GROUP BY 1),
            t AS (SELECT SUM(n) AS total FROM bins),
            c AS (SELECT r, SUM(n) OVER (ORDER BY r) AS prefix FROM bins),
            pick AS (SELECT MIN(r) AS r FROM c, t WHERE c.prefix >= 0.95 * t.total)
            SELECT CAST(-POWER(2, r) AS BIGINT) AS lower,
                   CAST(POWER(2, r) AS BIGINT) AS upper FROM pick
        """,
        "partition_by_keys": """
            SELECT l_returnflag, COUNT(*) AS n FROM lineitem
            WHERE l_returnflag IN ('A','N','R') GROUP BY 1
        """,
        "map_revenue": """
            SELECT l_orderkey,
                   ROUND(l_extendedprice * (1.0 - l_discount), 4) AS revenue
            FROM lineitem
        """,
        "flatmap_by_key": """
            SELECT l_orderkey, COUNT(*) AS n_lines, MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1
        """,
        "replace_nulls": """
            SELECT c.c_custkey,
                   COALESCE(CASE WHEN n.n_nationkey < 10 THEN n.n_name END,
                            'UNKNOWN') AS n_name
            FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "dedup_exact": """
            -- deterministic survivor: min doc_id per distinct text
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
            FROM documents GROUP BY text
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qvec
                       FROM embeddings WHERE vec_id < 20),
            scored AS (
                SELECT q.qid, e.vec_id,
                       list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e),
            ranked AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS INTEGER) AS n_tokens
            FROM documents
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id,
                              list_filter(string_split_regex(lower(text), '\\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
            h AS (SELECT doc_id,
                         len(list_intersect(list_distinct(toks), {_EN})) AS he,
                         len(list_intersect(list_distinct(toks), {_DE})) AS hd,
                         len(list_intersect(list_distinct(toks), {_FR})) AS hf,
                         len(list_intersect(list_distinct(toks), {_ES})) AS hs
                  FROM t)
            SELECT doc_id,
                   CASE WHEN GREATEST(he, hd, hf, hs) = 0 THEN 'unknown'
                        WHEN he >= hd AND he >= hf AND he >= hs THEN 'en'
                        WHEN hd >= hf AND hd >= hs THEN 'de'
                        WHEN hf >= hs THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM h
        """,
        "fingerprint_distinct": (
            "SELECT COUNT(DISTINCT text) AS n_distinct FROM documents"
        ),
        "streaming_window_counts": """
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                   COUNT(*) AS count
            FROM events GROUP BY 1, 2
        """,
        "zcdp_groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "approxdp_groupby_count": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_sum_cents": f"""
            WITH {flags_cte},
            c AS (SELECT l_returnflag,
                         SUM(CAST(ROUND(LEAST(GREATEST(l_extendedprice, 0.0), 10000.0) * 100) AS BIGINT)) AS s
                  FROM lineitem GROUP BY 1)
            SELECT k.l_returnflag, CAST(COALESCE(c.s, 0) AS BIGINT) AS sum_cents
            FROM keys k LEFT JOIN c USING (l_returnflag)
        """,
        "groupby_column_domains": """
            WITH flags(l_returnflag) AS (VALUES ('A'),('N'),('R'),('X')),
            stats(l_linestatus) AS (VALUES ('F'),('O')),
            keys AS (SELECT * FROM flags CROSS JOIN stats),
            c AS (SELECT l_returnflag, l_linestatus, COUNT(*) AS n
                  FROM lineitem GROUP BY 1, 2)
            SELECT k.l_returnflag, k.l_linestatus,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS count
            FROM keys k LEFT JOIN c USING (l_returnflag, l_linestatus)
        """,
        "drop_nulls_nans": """
            SELECT l_orderkey,
                   l_quantity AS v1,
                   l_quantity AS v2
            FROM lineitem WHERE l_quantity <= 40 AND l_quantity >= 10
        """,
        "replace_nans_infs": """
            SELECT l_orderkey,
                   CASE WHEN l_quantity < 5 THEN 0.0
                        WHEN l_quantity > 45 THEN 50.0
                        ELSE l_quantity END AS v
            FROM lineitem
        """,
        "flatmap_explode": """
            SELECT l_orderkey, CAST(u.i AS BIGINT) AS idx
            FROM lineitem, UNNEST(range(LEAST(l_linenumber, 3))) AS u(i)
        """,
        "grouping_flatmap": """
            SELECT CAST(r.replica AS BIGINT) AS replica, COUNT(*) AS n
            FROM lineitem CROSS JOIN (VALUES (0), (1)) AS r(replica)
            GROUP BY 1
        """,
        "add_unique_column": "SELECT COUNT(*) AS n_unique FROM lineitem",
        "join_on_nulls": """
            WITH d AS (SELECT l_orderkey,
                              CASE WHEN l_returnflag = 'N' THEN NULL
                                   ELSE l_returnflag END AS flag_or_null
                       FROM lineitem),
            pub(flag_or_null, label) AS (
                VALUES ('A', 'accepted'), (NULL, 'none'), ('R', 'returned'))
            SELECT d.flag_or_null, d.l_orderkey, pub.label
            FROM d JOIN pub ON d.flag_or_null IS NOT DISTINCT FROM pub.flag_or_null
        """,
        "ann_ivf": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qvec
                       FROM embeddings WHERE vec_id < 20),
            scored AS (
                SELECT q.qid, e.vec_id,
                       list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e),
            ranked AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "embedding_near_dups": """
            WITH both_sets AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS c
                FROM both_sets a JOIN both_sets b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, ROUND(c, 6) AS cosine
            FROM pairs WHERE c >= 0.999
        """,
        "profile_quantiles": """
            SELECT 'l_quantity' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_quantity' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_quantity' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_extendedprice' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.25 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.25), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.5 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.5), 6) AS value
            FROM lineitem UNION ALL SELECT 'l_discount' AS column, CAST(0.75 AS DOUBLE) AS p,
                   ROUND(quantile_cont(CAST(l_discount AS DOUBLE), 0.75), 6) AS value
            FROM lineitem
        """,
        "sq_codes": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
            dims AS (
                SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi
                FROM e, unnest(generate_series(1, len(v))) AS t(i)
                GROUP BY i),
            enc AS (
                SELECT e.vec_id, d.i,
                       CAST(least(greatest(round(
                           (v[d.i] - d.lo)
                           / (CASE WHEN d.hi > d.lo THEN d.hi - d.lo
                                   ELSE 1.0 END)
                           * 255), 0), 255) AS INTEGER) - 128 AS code
                FROM e, dims d)
            SELECT vec_id,
                   string_agg(CAST(code AS VARCHAR), ' ' ORDER BY i) AS sq_code
            FROM enc GROUP BY vec_id
        """,
        "normalize_text": """
            SELECT doc_id, text,
                   TRIM(REGEXP_REPLACE(LOWER(NFC_NORMALIZE(text)),
                                       '\\s+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        "sq_knn": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
            dims AS (
                SELECT i, MIN(v[i]) AS lo, MAX(v[i]) AS hi,
                       CASE WHEN MAX(v[i]) > MIN(v[i])
                            THEN MAX(v[i]) - MIN(v[i]) ELSE 1.0 END AS span
                FROM e, unnest(generate_series(1, len(v))) AS t(i)
                GROUP BY i),
            enc AS (
                SELECT e.vec_id, d.i, d.lo, d.span,
                       CAST(least(greatest(round(
                           (v[d.i] - d.lo) / d.span * 255), 0), 255)
                           AS INTEGER) - 128 AS code
                FROM e, dims d),
            dec AS (
                SELECT vec_id,
                       list(lo + (CAST(code AS DOUBLE) + 128) / 255 * span
                            ORDER BY i) AS v
                FROM enc GROUP BY vec_id),
            q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
                  FROM embeddings WHERE vec_id < 20),
            scored AS (
                SELECT q.qid, dec.vec_id,
                       list_cosine_similarity(q.qvec, dec.v) AS score
                FROM q CROSS JOIN dec),
            ranked AS (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score DESC, vec_id ASC)
                           AS rank
                FROM scored)
            SELECT qid, vec_id, CAST(rank AS INTEGER) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "stream_interval_join": """
            WITH v AS (
                SELECT user_id, ts AS view_ts, event_id AS view_id
                FROM events WHERE event_type = 'view'),
            b AS (
                SELECT user_id, ts AS buy_ts, event_id AS buy_id
                FROM events WHERE event_type = 'purchase')
            SELECT v.user_id, v.view_id, b.buy_id,
                   epoch_us(v.view_ts) AS view_epoch_us,
                   epoch_us(b.buy_ts) AS buy_epoch_us
            FROM v JOIN b ON v.user_id = b.user_id
            WHERE b.buy_ts >= v.view_ts
              AND b.buy_ts <= v.view_ts + INTERVAL 1800 SECONDS
        """,
        "bigram_logprob": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents),
            occ AS (
                SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               range(1, len(toks)),
                               i -> struct_pack(w1 := toks[i],
                                                w2 := toks[i + 1]))) AS b
                    FROM t WHERE len(toks) >= 2)),
            c1 AS (
                SELECT term, COUNT(*) AS c1 FROM (
                    SELECT unnest(toks) AS term FROM t) GROUP BY term),
            v AS (SELECT COUNT(DISTINCT term) AS v FROM (
                    SELECT unnest(toks) AS term FROM t)),
            c2 AS (
                SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY w1, w2),
            s AS (
                SELECT occ.doc_id, COUNT(*) AS n_bigrams,
                       AVG(ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * v.v))) AS alp
                FROM occ
                JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
                JOIN c1 ON occ.w1 = c1.term
                CROSS JOIN v
                GROUP BY occ.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_bigrams, 0) AS INTEGER) AS n_bigrams,
                   ROUND(s.alp, 6) AS avg_logprob
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """,
        # first-occurrence-wins is min over (doc_id, pos) lexicographic;
        # the arithmetic encoding below equals that ordering because
        # pos < 1e6 for every document at any test SF
        "dedup_paragraphs": """
            WITH u AS (
                SELECT doc_id,
                       unnest(string_split(text, ' table ')) AS unit,
                       generate_subscripts(string_split(text, ' table '), 1)
                           - 1 AS pos
                FROM documents),
            w AS (
                SELECT unit, MIN(doc_id * 1000000 + pos) AS win
                FROM u GROUP BY unit),
            k AS (
                SELECT u.doc_id, u.pos, u.unit,
                       (u.doc_id * 1000000 + u.pos) = w.win AS keep
                FROM u JOIN w ON u.unit = w.unit)
            SELECT doc_id,
                   COALESCE(array_to_string(
                       list(unit ORDER BY pos) FILTER (WHERE keep),
                       ' table '), '') AS text,
                   CAST(COUNT(*) AS INTEGER) AS n_units,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER)
                       AS n_kept
            FROM k GROUP BY doc_id
        """,
        # components of nation<-customer<-orders: each cluster's min id
        # is its (raw, < 1e6) nation key
        "connected_components": """
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS node,
                   CAST(c_nationkey AS BIGINT) AS component
            FROM customer
            UNION ALL
            SELECT c_custkey + 1000000, CAST(c_nationkey AS BIGINT)
            FROM customer
            UNION ALL
            SELECT o.o_orderkey + 2000000, CAST(c.c_nationkey AS BIGINT)
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        # identical oracle for the forced-distributed variant: the star
        # rounds and the local union-find compute the same fixpoint
        # (component = minimum id), so output is path-independent
        "connected_components_dist": """
            SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS node,
                   CAST(c_nationkey AS BIGINT) AS component
            FROM customer
            UNION ALL
            SELECT c_custkey + 1000000, CAST(c_nationkey AS BIGINT)
            FROM customer
            UNION ALL
            SELECT o.o_orderkey + 2000000, CAST(c.c_nationkey AS BIGINT)
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        # three identical copies per base doc form a 3-clique; the
        # canonical of each copy is the base doc id (cluster min)
        "dedup_connected": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(doc_id AS BIGINT) AS canonical_id
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT doc_id + 10000000, CAST(doc_id AS BIGINT)
            FROM documents WHERE doc_id < 100
            UNION ALL
            SELECT doc_id + 20000000, CAST(doc_id AS BIGINT)
            FROM documents WHERE doc_id < 100
        """,
        # identical Knuth multiplicative-hash arithmetic as
        # extensions/sampling.py (seed 7; bounds = floor(0.8*2^32),
        # floor(0.9*2^32))
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN (((1161830751 * CAST((((doc_id + 7) % 4294967296) - ((doc_id + 7) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 1161830751 * (((doc_id + 7) % 4294967296) % 65536)) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN (((1161830751 * CAST((((doc_id + 7) % 4294967296) - ((doc_id + 7) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 1161830751 * (((doc_id + 7) % 4294967296) % 65536)) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY (((1401181143 * CAST((((doc_id + 3) % 4294967296) - ((doc_id + 3) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 1401181143 * (((doc_id + 3) % 4294967296) % 65536)) % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 50
        """,
        # serial greedy packing per bucket, replayed as a recursive CTE
        "pack_sequences": """
            WITH RECURSIVE d AS (
                SELECT doc_id, doc_id % 16 AS bucket,
                       LEAST(n_chars, 4096) AS tok,
                       ROW_NUMBER() OVER (PARTITION BY doc_id % 16
                                          ORDER BY doc_id) AS rn
                FROM documents),
            packed AS (
                SELECT bucket, rn, doc_id, tok,
                       0 AS bin, tok AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT x.bucket, x.rn, x.doc_id, x.tok,
                       CASE WHEN p.fill + x.tok > 4096
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.fill + x.tok > 4096
                            THEN x.tok ELSE p.fill + x.tok END
                FROM d x JOIN packed p
                  ON x.bucket = p.bucket AND x.rn = p.rn + 1)
            SELECT doc_id, bucket, bin FROM packed
        """,
        # planted verbatim copies: flagged pairs are exactly the 30
        # (train doc, its +5M clone) pairs at jaccard 1
        "decontaminate": """
            SELECT doc_id AS train_id, doc_id + 5000000 AS holdout_id,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM documents WHERE doc_id >= 50 AND doc_id < 80
        """,
        # the full pipeline replayed in SQL: length gate -> min-id
        # dedup per text -> per-lang quota (seed 11) -> split (seed 13;
        # bounds floor(0.9*2^32), floor(0.95*2^32))
        "training_mix": """
            WITH f AS (
                SELECT doc_id, lang, text FROM documents
                WHERE n_chars >= 200),
            c AS (
                SELECT doc_id, lang FROM (
                    SELECT doc_id, lang,
                           ROW_NUMBER() OVER (PARTITION BY text
                                              ORDER BY doc_id) AS rn
                    FROM f) WHERE rn = 1),
            q AS (
                SELECT doc_id, lang FROM (
                    SELECT doc_id, lang,
                           ROW_NUMBER() OVER (
                               PARTITION BY lang
                               ORDER BY (((922480359 * CAST((((doc_id + 11) % 4294967296) - ((doc_id + 11) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 922480359 * (((doc_id + 11) % 4294967296) % 65536)) % 4294967296, doc_id) AS rn
                    FROM c) WHERE rn <= 100)
            SELECT doc_id, lang,
                   CASE WHEN (((2950288811 * CAST((((doc_id + 13) % 4294967296) - ((doc_id + 13) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2950288811 * (((doc_id + 13) % 4294967296) % 65536)) % 4294967296
                             < 3865470566 THEN 'train'
                        WHEN (((2950288811 * CAST((((doc_id + 13) % 4294967296) - ((doc_id + 13) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2950288811 * (((doc_id + 13) % 4294967296) % 65536)) % 4294967296
                             < 4080218931 THEN 'val'
                        ELSE 'test' END AS split
            FROM q
        """,
        # same RE2-safe patterns as extensions/text.py PII_PATTERNS,
        # applied in the same order (counts measured on the
        # progressively redacted text, like the operator)
        "redact_pii": """
            WITH planted AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com at 10.0.0.7 or +1 555-123-4567'
                           AS text
                FROM documents WHERE doc_id < 200),
            s1 AS (
                SELECT doc_id,
                       len(string_split_regex(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) - 1 AS n_email,
                       regexp_replace(text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
                FROM planted),
            s2 AS (
                SELECT doc_id, n_email,
                       len(string_split_regex(t1, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) - 1 AS n_ipv4,
                       regexp_replace(t1, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IPV4]', 'g') AS t2
                FROM s1),
            s3 AS (
                SELECT doc_id, n_email, n_ipv4,
                       len(string_split_regex(t2, '\\+?[0-9]{1,3}[ .\\-]?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}\\b')) - 1 AS n_phone,
                       regexp_replace(t2, '\\+?[0-9]{1,3}[ .\\-]?\\(?[0-9]{3}\\)?[ .\\-][0-9]{3}[ .\\-][0-9]{4}\\b', '[PHONE]', 'g') AS redacted
                FROM s2)
            SELECT doc_id, redacted, CAST(n_email AS BIGINT) AS n_email,
                   CAST(n_ipv4 AS BIGINT) AS n_ipv4,
                   CAST(n_phone AS BIGINT) AS n_phone
            FROM s3
        """,
        "profile_table": """
            SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT o_orderkey) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_custkey' AS column, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT o_custkey) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus' AS column, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT o_orderstatus) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_totalprice' AS column, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT o_totalprice) AS n_distinct
            FROM orders
        """,
        # the permutation is ascending (mix(id, 17), id); positions
        # dense in [0, n) — the bucket-offset scheme in
        # extensions/sampling.py::global_shuffle must equal this one
        # global ROW_NUMBER exactly
        "global_shuffle": """
            SELECT doc_id, lang,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY (((2710938419 * CAST((((doc_id + 17) % 4294967296) - ((doc_id + 17) % 4294967296) % 65536) / 65536 AS BIGINT)) % 65536) * 65536 + 2710938419 * (((doc_id + 17) % 4294967296) % 65536)) % 4294967296,
                                doc_id) - 1 AS BIGINT) AS pos
            FROM documents
        """,
    }
