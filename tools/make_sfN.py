#!/usr/bin/env python3
"""Scale the sf0.1 test tables by an integer factor for the scale-proof
bench (BENCH_SF1.md): the driver only ships sf{0.001,0.01,0.1}, and the
100 TB story needs at least one measured decade above the graded scale.

Replication semantics (deterministic, no RNG):
  - events: FACTOR copies; user_id/event_id shift by k*(max+1) per copy k
    so the record count scales 10x with the same per-record length
    distribution (the shape record-parallel operators care about).
  - documents: doc_id shifts; copy k's text is letter-rotated by k
    (a->b->c...) so copies are NOT cross-copy near-duplicates — naive
    replication would turn every doc into a 10-clique and inflate the
    LSH-bucket pair count ~100x, which is a different workload, not a
    bigger one. Within-copy dup structure is preserved exactly.
  - embeddings: vec_id shifts; copy k adds k*0.001 to every component
    (distinct vectors, near-identical magnitude/cluster shape).
  - remaining tables (lineitem, orders, ...) are copied unchanged — no
    heavy query reads them, and graft.Verify needs them present to run
    the full query set (tree/centroid/model oracle exports at this SF).

Usage: python3 tools/make_sfN.py <srcdir> <outdir> <factor>
"""
import sys, os, shutil, string
import duckdb


def rot_expr(col, k):
    if k == 0:
        return col
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    src = lower + upper
    dst = lower[k % 26:] + lower[:k % 26] + upper[k % 26:] + upper[:k % 26]
    return f"translate({col}, '{src}', '{dst}')"


def main():
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    ev = f"read_parquet('{src}/events.parquet')"
    mx = con.sql(f"SELECT max(user_id), max(event_id) FROM {ev}").fetchone()
    u_shift, e_shift = mx[0] + 1, mx[1] + 1
    arms = "\nUNION ALL\n".join(
        f"SELECT user_id + {k * u_shift} AS user_id, ts, event_id + {k * e_shift} AS event_id,"
        f" event_type, value FROM {ev}" for k in range(factor))
    con.execute(f"COPY ({arms}) TO '{out}/events.parquet' (FORMAT PARQUET)")

    dc = f"read_parquet('{src}/documents.parquet')"
    d_shift = con.sql(f"SELECT max(doc_id) + 1 FROM {dc}").fetchone()[0]
    arms = "\nUNION ALL\n".join(
        f"SELECT doc_id + {k * d_shift} AS doc_id, {rot_expr('text', k)} AS text,"
        f" lang, source, n_chars FROM {dc}" for k in range(factor))
    con.execute(f"COPY ({arms}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    em = f"read_parquet('{src}/embeddings.parquet')"
    v_shift = con.sql(f"SELECT max(vec_id) + 1 FROM {em}").fetchone()[0]
    cols = [c for c in con.sql(f"SELECT * FROM {em} LIMIT 0").columns
            if c not in ("vec_id", "embedding")]
    extra = (", " + ", ".join(cols)) if cols else ""
    arms = "\nUNION ALL\n".join(
        f"SELECT vec_id + {k * v_shift} AS vec_id,"
        f" list_transform(embedding, x -> CAST(x + {k} * 0.001 AS FLOAT)) AS embedding"
        f"{extra} FROM {em}" for k in range(factor))
    con.execute(f"COPY ({arms}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    for t in "region nation customer supplier part orders lineitem".split():
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{out}/{t}.parquet")
    for t in "events documents embeddings".split():
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
