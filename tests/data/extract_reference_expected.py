"""Regenerate reference_expected.npz from the reference's committed arrays.

Parses the hard-coded expected pixel arrays out of
/root/reference/tests/test_render_output.py by AST literal evaluation (no
code from the reference is executed or copied — only its committed test
DATA, which is exactly what tests/test_reference_parity.py must agree
with).  Run from the repo root:

    python tests/data/extract_reference_expected.py
"""

import ast
from pathlib import Path

import numpy as np

REFERENCE_TESTS = Path("/root/reference/tests/test_render_output.py")
NAMES = {
    "reference_result", "result_ref", "expect", "expect_den", "expect_qty",
    "expect_rgba", "quantity_expectation", "depth_expectation",
    "presentation_expectation",
}


def main():
    tree = ast.parse(REFERENCE_TESTS.read_text())
    out = {}
    for fn in tree.body:
        if not isinstance(fn, ast.FunctionDef):
            continue
        for node in ast.walk(fn):
            if (isinstance(node, ast.Assign) and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id in NAMES):
                v = node.value
                while isinstance(v, ast.Call):  # np.array(...) wrappers
                    v = v.args[0]
                try:
                    lit = ast.literal_eval(v)
                except ValueError:
                    continue  # re-assignment like x = np.asarray(x)
                out[f"{fn.name}.{node.targets[0].id}"] = np.asarray(lit)
    dest = Path(__file__).parent / "reference_expected.npz"
    np.savez(dest, **out)
    print(f"saved {len(out)} arrays to {dest}")


if __name__ == "__main__":
    main()
