"""Drift guard: the committed VALUES oracles must equal what the
generator produces from the CURRENT operators. If someone changes the
extraction kernels, the LSH numerics or the media features without
re-running tools/gen_values_oracles.py, this fails before the driver's
correctness gate does."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generated_oracles_match_committed():
    spec = importlib.util.spec_from_file_location(
        "gen_values_oracles", os.path.join(REPO, "tools", "gen_values_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.build()
    with open(os.path.join(REPO, "oracle_values.py")) as f:
        committed = f.read()
    assert fresh == committed, (
        "oracle_values.py is stale — re-run: python tools/gen_values_oracles.py"
    )
