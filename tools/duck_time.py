#!/usr/bin/env python3
"""Time a subset of the oracle SQL in DuckDB with a per-query timeout.

The scale-proof runs (BENCH_SF1.md) need DuckDB numbers for the heavy
queries at sf >= 1, where the dedup_clusters recursive CTE goes
superlinear — a timeout records an honest DNF instead of hanging the
harness. One invocation = one session (min-of-2 passes per query,
matching tools/baseline.py).

Usage: python3 tools/duck_time.py <sfdir> <oracle_sql.json> <timeout_s> [name ...]
Prints one JSON object {"duckdb": {name: sec | "DNF>Ts" | "err ..."}}.
"""
import sys, json, time, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir, oracle_path, timeout_s = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:]
    oracles = json.load(open(oracle_path))
    if names:
        missing = [n for n in names if n not in oracles]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        oracles = {n: oracles[n] for n in names}
    con = duckdb.connect()
    con.execute("SET temp_directory = '/tmp/duck_spill'")  # allow spill (in-memory conns cannot otherwise)
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for name, sql in oracles.items():
        best = float("inf")
        verdict = None
        for _ in range(2):
            # duckdb honors interrupt() from another thread; a watchdog
            # converts a runaway pass into a DNF row
            import threading
            timed_out = [False]

            def watchdog():
                timed_out[0] = True
                con.interrupt()

            timer = threading.Timer(timeout_s, watchdog)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            except Exception as e:
                verdict = (f"DNF>{int(timeout_s)}s" if timed_out[0]
                           else f"err {str(e)[:80]}")
                timer.cancel()
                break
            finally:
                timer.cancel()
        # min-of-2 contract: a valid pass-1 time beats a pass-2 DNF/err —
        # publishing the verdict in that case would discard a finished
        # measurement and pessimize the baseline
        out[name] = best if best != float("inf") else verdict
        print(f"[duck] {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf": sfdir, "duckdb": out}))


if __name__ == "__main__":
    main()
