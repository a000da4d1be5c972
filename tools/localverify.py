#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (Spark) into OUT_DIR, then executes each oracle_sql.json
entry in DuckDB over the same parquet tables and compares three ways, the
last being the gate the driver actually applies:

  1. columns (sorted by name) and row counts;
  2. per-column value equality (diagnostic — pinpoints WHERE a diff is);
  3. a hash over the canonically-serialized frame, with the Spark side
     read through pyarrow/pandas and the oracle side through DuckDB's
     .df() — two DISTINCT read paths, like the driver's. Value-equal
     frames can still hash-differ when a column's emitted type serializes
     differently across paths (round 5: DECIMAL(38,6) cells read as
     Decimal('123.450000') one way and 123.45 the other — pandas `==`
     said equal, the driver's hash said no). A row is PASS only if all
     three agree.

Usage:

    python3 tools/localverify.py [sfdir] [outdir] [--skip-spark]
        [--json out.json] [--workers N] [only ...]
    python3 tools/localverify.py --selftest
"""
import datetime
import decimal
import hashlib
import json, os, subprocess, sys, time

import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
    else "/tmp/graft_verify"
SKIP_SPARK = "--skip-spark" in sys.argv
SELFTEST = "--selftest" in sys.argv
# --json <path>: also write a driver-format artifact
# ({name: {rows_match, schema_match, hash_match, spark_rows,
#   oracle_rows, err}})
JSON_OUT = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
        sys.exit("usage: --json <path> (missing output path)")
    JSON_OUT = sys.argv[i + 1]
# --workers N: fan the DuckDB compare out over N child processes
# (round-robin name slices, partial JSONs merged by the parent). The
# compare is CPU-bound per query — oracle SQL + Python canonical
# serialization — so at sf1 a single process takes hours while the
# machine idles; 4 workers cut the 197-row gate to ~25 min. The Spark
# phase still runs ONCE, in the parent, before the fan-out.
WORKERS = 1
_workers_tok = None
if "--workers" in sys.argv:
    i = sys.argv.index("--workers")
    if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
        sys.exit("usage: --workers <N> (missing worker count)")
    _workers_tok = sys.argv[i + 1]
    WORKERS = max(1, int(_workers_tok))
ONLY = [a for a in sys.argv[3:]
        if not a.startswith("--") and a != JSON_OUT and a != _workers_tok]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Stall watchdog: a rare Spark-local task-kill race (seen once at sf1,
# after a streaming-query stop) can leak every scheduler core, leaving
# the next write job parked forever with an idle JVM. Detect "no new
# completed query dir for STALL_SECS", kill the process group, and
# relaunch Verify with --skip-existing so it resumes from the completed
# set instead of starting over.
STALL_SECS = int(os.environ.get("GRAFT_VERIFY_STALL_SECS", "900"))
MAX_ATTEMPTS = 3
# Livelock backstop: max consecutive CPU-busy extensions before the
# watchdog kills anyway (ADVICE r9 — a spin-hang looks "busy" forever).
MAX_BUSY_WAIVERS = int(os.environ.get("GRAFT_VERIFY_BUSY_WAIVERS", "8"))


def _pg_cpu_jiffies(pgid):
    """Sum utime+stime jiffies over every process in the group — the
    busy-vs-hung discriminator for the watchdog. The one observed
    leak leaves the JVM CPU-IDLE (all scheduler cores parked), so a
    stall with real CPU burn is just a long query, not the hang; killing
    it would loop resume-from-scratch until MAX_ATTEMPTS and fail a
    healthy gate (plausible at sf1+, where single heavy queries can
    legitimately exceed STALL_SECS)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                rest = f.read().rsplit(b") ", 1)[1].split()
            if int(rest[2]) != pgid:  # field 5 (pgrp); rest starts at 3
                continue
            total += int(rest[11]) + int(rest[12])  # utime+stime (f14,15)
        except (OSError, IndexError, ValueError):
            continue
    return total


def _pg_cpu_busy(pgid, window=3.0, min_core_frac=0.25):
    """True when the process group burns > min_core_frac of one core
    over `window` seconds."""
    try:
        hz = os.sysconf("SC_CLK_TCK")
    except (ValueError, OSError):
        hz = 100
    before = _pg_cpu_jiffies(pgid)
    time.sleep(window)
    delta = _pg_cpu_jiffies(pgid) - before
    return delta > min_core_frac * hz * window


def _done_count():
    try:
        return sum(1 for n in os.listdir(OUT_DIR)
                   if os.path.exists(os.path.join(OUT_DIR, n, "_SUCCESS")))
    except FileNotFoundError:
        return 0


def _java_cmd(names, resume):
    """Direct-java Verify invocation against GRAFT_VERIFY_CLASSDIR —
    no sbt project lock and no compile-window race with a parallel dev
    loop: snapshot target/scala-2.13/classes somewhere stable, point
    the env var at it, and later recompiles can't disturb the running
    gate. Heap from SPARK_DRIVER_MEM (matching build.sbt's run fork).
    """
    classdir = os.environ["GRAFT_VERIFY_CLASSDIR"]
    opens = []
    for pkg in ("java.lang java.lang.invoke java.lang.reflect java.io "
                "java.net java.nio java.util java.util.concurrent "
                "java.util.concurrent.atomic sun.nio.ch sun.nio.cs "
                "sun.security.action sun.util.calendar").split():
        opens += ["--add-opens", f"java.base/{pkg}=ALL-UNNAMED"]
    return (["java", f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '8g')}"]
            + opens
            + ["-Dspark.ui.enabled=false",
               "-Dspark.sql.session.timeZone=UTC",
               "-cp", f"{classdir}:/opt/spark/jars/*",
               "graft.Verify", SF_DIR, OUT_DIR]
            + [n for n in names.split() if n]
            + (["--skip-existing"] if resume else []))


def run_spark():
    # 8 Spark threads by default (bounds executor-storage pressure in
    # the one-JVM suite); GRAFT_VERIFY_CPUS overrides for big-SF runs
    # where scan parallelism, not memory, is the binding constraint.
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
        "GRAFT_VERIFY_CPUS", "8"))
    names = " ".join(ONLY)
    for attempt in range(1, MAX_ATTEMPTS + 1):
        resume = " --skip-existing" if attempt > 1 else ""
        if os.environ.get("GRAFT_VERIFY_CLASSDIR"):
            cmd = _java_cmd(names, bool(resume))
        else:
            cmd = ["sbt", "-batch",
                   f'runMain graft.Verify {SF_DIR} {OUT_DIR} {names}{resume}']
        p = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True,
                             start_new_session=True)
        last_done, last_progress = _done_count(), time.time()
        out_tail = []
        import threading

        def pump():
            for line in p.stdout:
                out_tail.append(line)
                del out_tail[:-200]
        t = threading.Thread(target=pump, daemon=True)
        t.start()
        stalled = False
        busy_waivers = 0  # consecutive CPU-busy extensions granted
        while p.poll() is None:
            time.sleep(15)
            done = _done_count()
            if done != last_done:
                last_done, last_progress = done, time.time()
                busy_waivers = 0
            elif time.time() - last_progress > STALL_SECS:
                # kill only a CPU-IDLE group: the known hang parks every
                # scheduler core; a busy JVM is a long query — let it
                # run, but NOT forever: a CPU-spinning livelock would
                # also look "busy", so cap the consecutive extensions
                # (MAX_BUSY_WAIVERS * STALL_SECS without one completed
                # query kills regardless of CPU).
                try:
                    pgid = os.getpgid(p.pid)
                except ProcessLookupError:
                    break  # JVM exited during the check window
                if busy_waivers < MAX_BUSY_WAIVERS and _pg_cpu_busy(pgid):
                    busy_waivers += 1
                    sys.stderr.write(
                        f"[watchdog] {int(time.time() - last_progress)}s "
                        f"without a completed query but the JVM is "
                        f"CPU-busy — long query, not a stall; waiting "
                        f"(waiver {busy_waivers}/{MAX_BUSY_WAIVERS})\n")
                    last_progress = time.time()
                    continue
                why = ("JVM is CPU-idle" if busy_waivers < MAX_BUSY_WAIVERS
                       else f"busy-waiver cap ({MAX_BUSY_WAIVERS}) hit")
                sys.stderr.write(
                    f"[watchdog] no completed query for {STALL_SECS}s "
                    f"and {why} ({done} done) — killing "
                    f"attempt {attempt}\n")
                try:
                    os.killpg(pgid, 9)
                except ProcessLookupError:
                    pass
                stalled = True
                break
        p.wait()
        sys.stdout.write("".join(out_tail[-60:]))
        if not stalled and p.returncode == 0:
            return
        if not stalled and p.returncode != 0:
            sys.stderr.write(f"[verify] sbt exited rc={p.returncode}\n")
            sys.exit(1)
    sys.stderr.write(f"[watchdog] still stalled after {MAX_ATTEMPTS} "
                     "attempts\n")
    sys.exit(1)


def normalize(df):
    return df.reindex(sorted(df.columns), axis=1)


def canon_cell(v):
    """Canonical, TYPE-SENSITIVE serialization of one cell.

    Intentionally distinguishes decimal.Decimal (scale-preserving str,
    e.g. '123.450000') from float (repr, '123.45') — that distinction is
    exactly the class the driver's hash catches and pandas == does not.
    Date-kinded values are unified to ISO midnight timestamps because the
    two read paths legitimately disagree on date32 vs datetime64 while
    the driver treats them as equal (date-emitting rows are green).
    """
    if v is None:
        return "\\N"
    if isinstance(v, (np.ndarray, list, tuple)):
        items = v.tolist() if isinstance(v, np.ndarray) else list(v)
        return "[" + ",".join(canon_cell(x) for x in items) + "]"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "\\N" if f != f else repr(f)
    if isinstance(v, pd.Timestamp):
        return "\\N" if pd.isna(v) else v.isoformat()
    if isinstance(v, datetime.datetime):
        # pd.NaT subclasses datetime.datetime and isoformat()s to 'NaT';
        # a NULL date read as NaT (datetime64 path) must serialize like
        # a NULL date read as None (object path) or equal frames
        # hash-differ (seen at sf1: customers with no purchases)
        return "\\N" if pd.isna(v) else v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime.combine(v, datetime.time()).isoformat()
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    try:
        if pd.isna(v):
            return "\\N"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_hash(df):
    """sha256 over the canonical serialization: columns sorted by name,
    rows as-emitted, cells via canon_cell (unit-separated)."""
    df = normalize(df)
    h = hashlib.sha256()
    h.update(("\x1f".join(map(str, df.columns)) + "\x1e").encode())
    for row in df.itertuples(index=False, name=None):
        h.update(("\x1f".join(canon_cell(v) for v in row) + "\x1e").encode())
    return h.hexdigest()


# Above this many rows the pandas row-hash comparator is impractical
# (itertuples over hundreds of millions of rows); compare entirely inside
# DuckDB instead: column names, exact row count, and a full-width
# order-independent aggregate checksum (sum + bit_xor of hash(row)) over
# ALL columns of both sides. Weaker than the driver's ordered hash only
# in row ORDER (column order is sorted-name on BOTH paths — the driver
# itself sorts columns by name before hashing, so that is not an extra
# weakening) — acceptable for the self-imposed large-SF gate; the
# driver's sf0.01 gate below threshold keeps the exact comparator.
BIG_ROWS = 2_000_000


def record(rows=False, schema=False, hashm=False, sr=None, orr=None,
           err=None):
    return {"rows_match": rows, "schema_match": schema,
            "hash_match": hashm, "spark_rows": sr, "oracle_rows": orr,
            "err": err}


RECORDS = {}


def compare_big(name, sql, con, res_dir, n_mine):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{res_dir}/*.parquet')"
    ).fetchall()]
    try:
        ocols = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    except Exception as e:
        RECORDS[name] = record(err=f"oracle error: {e}")
        return f"FAIL {name}: oracle error: {e}"
    # sorted-name compare, matching the exact comparator below threshold
    # (normalize() reindexes both frames to sorted column order before
    # comparing — the driver contract); column ORDER is intentionally
    # not part of either path
    if sorted(cols) != sorted(ocols):
        RECORDS[name] = record(sr=n_mine, err="column mismatch")
        return f"FAIL {name}: columns spark={sorted(cols)} oracle={sorted(ocols)}"
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    agg = ("count(*), sum(hash(ROW(%s))), bit_xor(hash(ROW(%s)))"
           % (sel, sel))
    a = con.execute(
        f"SELECT {agg} FROM read_parquet('{res_dir}/*.parquet')").fetchone()
    b = con.execute(f"SELECT {agg} FROM ({sql}) t").fetchone()
    if a[0] != b[0]:
        RECORDS[name] = record(schema=True, sr=a[0], orr=b[0])
        return f"FAIL {name}: rows spark={a[0]} oracle={b[0]}"
    if a[1:] != b[1:]:
        RECORDS[name] = record(rows=True, schema=True, sr=a[0], orr=b[0])
        return f"FAIL {name}: aggregate row-hash checksum differs"
    RECORDS[name] = record(True, True, True, a[0], b[0])
    return (f"PASS {name} ({a[0]} rows) "
            f"[big-frame: unordered duckdb checksum, sorted-name columns]")


def compare(name, sql, con):
    res_dir = os.path.join(OUT_DIR, name)
    if not os.path.isdir(res_dir):
        RECORDS[name] = record(err="no spark output")
        return f"FAIL {name}: no spark output"
    n_mine = con.execute(
        f"SELECT count(*) FROM read_parquet('{res_dir}/*.parquet')"
    ).fetchone()[0]
    if n_mine > BIG_ROWS:
        return compare_big(name, sql, con, res_dir, n_mine)
    # the Spark side goes through pyarrow/pandas, the oracle through
    # DuckDB's .df() — two distinct read paths, as at the driver
    mine = pd.read_parquet(res_dir)
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        RECORDS[name] = record(err=f"oracle error: {e}")
        return f"FAIL {name}: oracle error: {e}"
    mine, oracle = normalize(mine), normalize(oracle)
    RECORDS[name] = record(len(mine) == len(oracle),
                           list(mine.columns) == list(oracle.columns),
                           False, len(mine), len(oracle))
    if list(mine.columns) != list(oracle.columns):
        return (f"FAIL {name}: columns spark={list(mine.columns)} "
                f"oracle={list(oracle.columns)}")
    if len(mine) != len(oracle):
        return f"FAIL {name}: rows spark={len(mine)} oracle={len(oracle)}"
    schema_notes = []
    for c in mine.columns:
        if str(mine[c].dtype) != str(oracle[c].dtype):
            schema_notes.append(f"{c}: {mine[c].dtype} vs {oracle[c].dtype}")
    bad = []
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            idx = (~eq).idxmax()
            bad.append(f"{c} ({int((~eq).sum())} diff, e.g. row {idx}: "
                       f"{a[idx]!r} vs {b[idx]!r})")
    if bad:
        return f"FAIL {name}: value diffs: {'; '.join(bad[:5])}"
    if frame_hash(mine) != frame_hash(oracle):
        culprits = [c for c in mine.columns
                    if [canon_cell(v) for v in mine[c]]
                    != [canon_cell(v) for v in oracle[c]]]
        return (f"FAIL {name}: values equal but canonical hash differs "
                f"(serialization-unstable columns: {culprits or 'row order'})")
    RECORDS[name]["hash_match"] = True
    note = f" [schema: {', '.join(schema_notes)}]" if schema_notes else ""
    return f"PASS {name} ({len(mine)} rows){note}"


def selftest():
    """The round-5 regression in miniature: a Spark-written DECIMAL(38,6)
    parquet column read back through pyarrow (object-dtype Decimal cells,
    exactly how a Spark DECIMAL output reaches the comparator) vs the same
    values as DOUBLE from DuckDB must pass pandas == yet FAIL the hash
    gate; the DOUBLE/DOUBLE pair must pass both."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "dec.parquet")
        con.execute(
            "COPY (SELECT CAST(x AS DECIMAL(38,6)) AS v "
            "FROM (VALUES (123.45), (0.5)) t(x)) TO '" + p + "' (FORMAT PARQUET)")
        dec = pd.read_parquet(p)
    dbl = con.execute(
        "SELECT CAST(x AS DOUBLE) AS v FROM (VALUES (123.45), (0.5)) t(x)"
    ).fetchdf()
    assert isinstance(dec["v"].iloc[0], decimal.Decimal), \
        "fixture must reach the comparator as decimal.Decimal cells"
    eq = all(float(a) == float(b) for a, b in zip(dec["v"], dbl["v"]))
    assert eq, "fixture values must be numerically equal"
    assert frame_hash(dec) != frame_hash(dbl), \
        "hash gate MUST distinguish DECIMAL from DOUBLE serialization"
    assert frame_hash(dbl) == frame_hash(dbl.copy()), "hash must be stable"
    # date32 (object datetime.date) vs datetime64 midnight must UNIFY
    d1 = pd.DataFrame({"d": [datetime.date(2001, 11, 5)]})
    d2 = pd.DataFrame({"d": pd.to_datetime(["2001-11-05"])})
    assert frame_hash(d1) == frame_hash(d2), "date kinds must unify"
    print("SELFTEST PASS: decimal-vs-double caught, dates unified")


def fan_out(oracles):
    """Parent side of --workers: re-exec self over round-robin name
    slices (children inherit --skip-spark — the Spark phase already ran
    — and write partial JSONs the parent merges into JSON_OUT)."""
    names = sorted(n for n in oracles if not ONLY or n in ONLY)
    slices = [names[i::WORKERS] for i in range(WORKERS)]
    procs, parts = [], []
    for i, sl in enumerate(slices):
        if not sl:
            continue
        part = f"{OUT_DIR}/__part_{i}.json"
        parts.append(part)
        cmd = [sys.executable, os.path.abspath(__file__), SF_DIR, OUT_DIR,
               "--skip-spark", "--json", part] + sl
        # split the DuckDB budget so N concurrently-spilling children
        # stay under the machine (observed 4-worker peak: ~86 GB)
        env = dict(os.environ,
                   GRAFT_DUCKDB_MEM=os.environ.get(
                       "GRAFT_DUCKDB_MEM", f"{max(20, 100 // WORKERS)}GB"))
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True,
                                      env=env))
    # Stream every child's lines as they arrive (live progress, and a
    # child can never block on a full pipe): one pump thread per child.
    import threading
    lock = threading.Lock()
    fail_count = [0]

    def pump(p):
        for line in p.stdout:
            line = line.rstrip("\n")
            # suppress the children's own artifact-write notices; every
            # PASS/FAIL/ROWS line streams through verbatim
            if line.startswith("wrote "):
                continue
            with lock:
                print(line, flush=True)
                fail_count[0] += line.startswith("FAIL")
    pumps = [threading.Thread(target=pump, args=(p,)) for p in procs]
    for t in pumps:
        t.start()
    for p in procs:
        p.wait()
    for t in pumps:
        t.join()
    failures = fail_count[0]
    for part in parts:
        try:
            with open(part) as f:
                RECORDS.update(json.load(f))
            os.remove(part)
        except FileNotFoundError:
            sys.stderr.write(f"[workers] missing partial {part} — a "
                             "worker died before writing it\n")
            failures += 1
    # Infra-shaped failures (disk-full / OOM) happen when several
    # workers spill a heavy oracle CTE at once — the graph/dd families
    # sit adjacent in sorted order, so round-robin slices reach them
    # SIMULTANEOUSLY. Those are not correctness verdicts: re-run them
    # serially with the whole memory budget before writing the artifact.
    infra = [n for n, r in RECORDS.items() if r.get("err") and
             ("No space left" in r["err"] or "Out of Memory" in r["err"])]
    if infra:
        print(f"[workers] re-running {len(infra)} infra-failed rows "
              "serially with the full budget: " + " ".join(sorted(infra)),
              flush=True)
        part = f"{OUT_DIR}/__redo.json"
        cmd = [sys.executable, os.path.abspath(__file__), SF_DIR, OUT_DIR,
               "--skip-spark", "--json", part] + sorted(infra)
        env = dict(os.environ)
        env.pop("GRAFT_DUCKDB_MEM", None)
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, env=env)
        for line in p.stdout:
            line = line.rstrip("\n")
            if not line.startswith("wrote "):
                print(line, flush=True)
        p.wait()
        try:
            with open(part) as f:
                RECORDS.update(json.load(f))
            os.remove(part)
        except FileNotFoundError:
            sys.stderr.write("[workers] serial re-run died before "
                             "writing its partial\n")
        failures = sum(1 for r in RECORDS.values()
                       if not (r.get("rows_match") and r.get("schema_match")
                               and r.get("hash_match")))
    if not ONLY:
        con = duckdb.connect()
        for name in sorted(os.listdir(OUT_DIR)):
            p = os.path.join(OUT_DIR, name)
            if os.path.isdir(p) and name not in oracles:
                n = len(con.execute(
                    f"SELECT 1 FROM read_parquet('{p}/*.parquet')"
                ).fetchall())
                print(f"ROWS {name}: {n} rows (no oracle)")
    if JSON_OUT:
        merge_walls()
        with open(JSON_OUT, "w") as f:
            json.dump(RECORDS, f, indent=0, sort_keys=True)
        print(f"wrote {JSON_OUT} ({len(RECORDS)} records)")
    sys.exit(1 if failures else 0)



def merge_walls():
    """Stamp graft.Verify's per-query wall (OUT_DIR/walls.json) into each
    record as wall_sec — the sf10 gate's Spark phase runs every tier row
    anyway, and the walls are the per-query perf evidence at rungs Bench
    never visits (VERDICT r13 task 1)."""
    try:
        with open(os.path.join(OUT_DIR, "walls.json")) as fh:
            walls = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return
    for name, rec in RECORDS.items():
        if name in walls:
            rec["wall_sec"] = walls[name]


def main():
    if SELFTEST:
        selftest()
        return
    if not SKIP_SPARK:
        run_spark()
    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracles = json.load(f)
    if WORKERS > 1:
        fan_out(oracles)
        return
    con = duckdb.connect()
    # An in-memory DuckDB has NO temp directory, so blocking operators
    # (hash join/agg over the unrolled graph CTE chains at large SF)
    # cannot spill and die with "Out of Memory Error". Point temp at
    # disk and cap memory below the machine so the OS survives. The dir
    # is PER-PROCESS: concurrent --workers children sharing one temp dir
    # collide on DuckDB's unqualified temp file names ("Could not read
    # enough bytes from duckdb_temp_storage-2.tmp" — observed when two
    # workers spilled simultaneously). Memory is capped per worker so N
    # concurrent spilling children stay under the machine.
    spill = f"/tmp/duckdb_spill_{os.getpid()}"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCKDB_MEM", "80GB"))
    for t in TABLES:
        # single-file testdata (driver sfs) vs directory-of-parts
        # (graft.ScaleUp output): glob the parts when it's a directory
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    failures = 0
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            msg = compare(name, sql, con)
        except Exception as e:
            # a row-level crash (e.g. DuckDB IO error when the disk
            # fills mid-spill) must cost ONE row, not the whole
            # process — under --workers a dead child loses its entire
            # slice's records
            RECORDS[name] = record(err=f"comparator crash: {e}")
            msg = f"FAIL {name}: comparator crash: {e}"
        print(msg, flush=True)
        failures += msg.startswith("FAIL")
    # queries without an oracle: rows-only (skipped under a name
    # restriction — a --workers child would otherwise print this block
    # once PER WORKER; the fan-out parent prints it instead)
    if not ONLY:
        for name in sorted(os.listdir(OUT_DIR)):
            p = os.path.join(OUT_DIR, name)
            if os.path.isdir(p) and name not in oracles:
                n = len(con.execute(
                    f"SELECT 1 FROM read_parquet('{p}/*.parquet')"
                ).fetchall())
                print(f"ROWS {name}: {n} rows (no oracle)")
    if JSON_OUT:
        merge_walls()
        with open(JSON_OUT, "w") as f:
            json.dump(RECORDS, f, indent=0, sort_keys=True)
        print(f"wrote {JSON_OUT} ({len(RECORDS)} records)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
