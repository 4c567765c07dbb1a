"""Round-end driver rehearsal: evaluate EVERY queries() entry in driver
order against its DuckDB oracle at the given sf (default sf0.01), with
the driver's compare semantics (oracle_util).  Prints one line per
query; exits nonzero on any failure.  Usage:

    python tests/dryrun_driver.py [sf_dir] [start:stop]
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

from tests.conftest import make_spark  # noqa: E402
from tests.oracle_util import compare, duck_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sl = slice(None)
    if len(sys.argv) > 2:
        a, b = sys.argv[2].split(":")
        sl = slice(int(a) if a else None, int(b) if b else None)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)[sl]
    failed = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf)
            if name in oracles:
                compare(df, con, oracles[name], name)
                status = "green"
            else:
                n = df.count()
                assert n >= 0
                status = f"rows_only({n})"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL {exc}"
            failed.append(name)
            traceback.print_exc()
        print(f"[{i + 1:3d}/{len(names)}] {name:35s} {status:12s} "
              f"{time.time() - t0:6.1f}s", flush=True)
    print("FAILED:", failed if failed else "none", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
