"""Guard against jitting over closed-over weights.

A jit that CLOSES over model variables inlines them into the HLO as
literal constants: XLA constant-folds them at compile time (~460 s for a
63M-param text tower on the dev host, measured round 5), persistent-cache
entries balloon to ~700 MB, and the cache key includes the weight VALUES
(any checkpoint change = full recompile). The fix pattern everywhere in
this repo is to pass variables as jit ARGUMENTS
(models/text_features.py:64-71 documents the incident).

This test encodes that rule structurally: every ``jax.jit(lambda ...)``
in the package (and the measurement harnesses) must declare a parameter
that plausibly carries the variables — it may not be a closure over them.
Lambdas whose body never references ``.apply`` are exempt (pure-array
helpers can't capture weight trees).
"""

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent

# parameter names this codebase uses for the variables/params argument
VAR_PARAM_NAMES = {"v", "variables", "params", "p", "state"}


def _jit_lambdas(tree):
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        is_jit = (isinstance(func, ast.Attribute) and func.attr == "jit") or (
            isinstance(func, ast.Name) and func.id == "jit")
        if is_jit and node.args and isinstance(node.args[0], ast.Lambda):
            yield node.args[0]


def _mentions_apply(lam: ast.Lambda) -> bool:
    return any(isinstance(n, ast.Attribute) and n.attr in ("apply", "init")
               for n in ast.walk(lam.body))


def test_jitted_lambdas_take_variables_as_arguments():
    roots = [REPO / "clipspm_tpu", REPO / "scripts"]
    files = [REPO / "bench.py", REPO / "__graft_entry__.py"]
    for root in roots:
        files.extend(sorted(root.rglob("*.py")))
    offenders = []
    for path in files:
        tree = ast.parse(path.read_text(), filename=str(path))
        for lam in _jit_lambdas(tree):
            if not _mentions_apply(lam):
                continue  # no module.apply -> cannot capture a weight tree
            names = {a.arg for a in lam.args.args}
            if not (names & VAR_PARAM_NAMES):
                offenders.append(f"{path.relative_to(REPO)}:{lam.lineno}")
    assert not offenders, (
        "jax.jit(lambda ...) closing over model variables (pass them as an "
        f"argument named one of {sorted(VAR_PARAM_NAMES)}): {offenders}")
