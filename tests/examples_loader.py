"""Load examples/ scripts as modules for the example tests (examples/ is
a script directory, not a package)."""

import importlib.util
import os

EXAMPLES = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "examples")
)


def load_module(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
