"""Import-smoke every example module: catches broken imports/signatures at
test time instead of at demo time (an example shipped two rounds with a bad
import that only failed when run)."""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
    if not p.name.startswith("_")     # _common.py / _obj_app.py are helpers
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports_and_has_main(path):
    sys.path.insert(0, str(path.parent))
    try:
        spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert callable(getattr(mod, "main", None)), f"{path.name} has no main()"
    finally:
        sys.path.remove(str(path.parent))
