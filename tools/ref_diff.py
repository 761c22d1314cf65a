#!/usr/bin/env python3
"""Differential-parity harness: execute the REFERENCE pipeline itself
(/root/reference/flows/pipeline.py, read-only) on a given CSV so a ScalaTest
spec (DifferentialRefSpec) can diff its outputs against graft's
PipelineMain.runCli on the SAME file.

Usage: python3 tools/ref_diff.py INPUT_CSV WORKDIR
Exit codes mirror the reference flow: 0 pass, 1 missing input (the flow's
sys.exit(1)), 2 quality-gate breach (the flow's RuntimeError).
Outputs land under WORKDIR exactly where the reference puts them:
  data/dq_metrics_pre.json, data/dq_metrics_post.json, data/results.duckdb,
  curated/region_risk_avg.csv, curated/top3_recent_sales_by_receiving.csv.
MIN_CONFORMITY_PRE / MIN_CONFORMITY_POST env vars pass through untouched
(the reference reads them at import time).

The reference imports prefect, which this sandbox does not ship; a minimal
stub is injected into sys.modules BEFORE the import: @task/@flow become
identity decorators (so task bodies run as plain functions, same control
flow) and get_run_logger returns a stdlib logger. The pipeline body itself
executes unmodified — this harness adds no semantics of its own.

Test-harness only (driver-side python per TESTDATA.md); not part of the
Spark library.
"""
import importlib.util
import logging
import os
import sys
import types


def main() -> int:
    input_csv = os.path.abspath(sys.argv[1])
    workdir = os.path.abspath(sys.argv[2])
    os.makedirs(workdir, exist_ok=True)
    # The reference writes to ./data and ./curated relative to CWD.
    os.chdir(workdir)
    os.environ["INPUT_CSV"] = input_csv

    prefect = types.ModuleType("prefect")

    def identity_decorator(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    prefect.task = identity_decorator
    prefect.flow = identity_decorator
    logging.basicConfig(level=logging.INFO)
    prefect.get_run_logger = lambda: logging.getLogger("ref")
    sys.modules["prefect"] = prefect

    spec = importlib.util.spec_from_file_location(
        "ref_pipeline", "/root/reference/flows/pipeline.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)  # module-level makedirs run in workdir
        mod.main()
        return 0
    except SystemExit as e:  # missing input: the flow calls sys.exit(1)
        return int(e.code or 0)
    except RuntimeError as e:  # conformity-gate breach (pipeline.py:248,259)
        sys.stderr.write(f"gate: {e}\n")
        return 2


if __name__ == "__main__":
    sys.exit(main())
