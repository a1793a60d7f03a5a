"""Driver-prefix staleness rotation (VERDICT r11 next-round #2).

The per-round correctness driver verifies only the first ``_DRIVER_CAP``
(50) catalog entries, so most of the ~250-entry catalog goes unverified
for many rounds.  The r07-r11 HUGEINT episode proved the local gate can
silently diverge from the driver's pandas/Arrow hash path for a whole
class of entries, so driver-row freshness is itself a correctness
signal.  This tool computes, from the CORRECTNESS_r*.json history, each
entry's most recent GREEN driver round (rows+schema+hash all true) and
prints the longest-unverified greens — the candidates for the next
round's ``_DRIVER_PREFIX`` after any must-verify (new / plan-changed /
oracle-changed) entries.

Usage:
    python tools/rotation.py [--n 30] [--markdown]

``--markdown`` emits the full last_driver_green table for COVERAGE.md.
"""

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history():
    """-> dict name -> {round: green_bool} across all CORRECTNESS files."""
    hist = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            green = bool(row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match") and not row.get("err"))
            hist.setdefault(name, {})[rnd] = green
    return hist


def last_green(hist):
    """-> dict name -> last green round (0 if never green)."""
    return {name: max((r for r, g in rounds.items() if g), default=0)
            for name, rounds in hist.items()}


# -------------------------------------------------------- --changed
# VERDICT r12 "What's wrong" #2: an entry must count as must-verify
# when ANY module in its transitive engine-dependency closure changed,
# not just when its own plan/oracle text did (local-green != driver-
# green after a plan-affecting edit — the HUGEINT lesson).  These
# helpers map changed engine files -> affected catalog entries.

# graphite_query()-registered entries run through the whole parse ->
# evaluate -> serialize stack, so a change to ANY of these subpackages
# touches every such entry.
_EVALUATOR_PREFIXES = ("carbonapi_spark.parser", "carbonapi_spark.functions",
                       "carbonapi_spark.model", "carbonapi_spark.render",
                       "carbonapi_spark.sources.lake",
                       "carbonapi_spark.sources.testdata")


def _ast_of(path):
    import ast
    with open(path) as f:
        return ast.parse(f.read())


def _local_imports(node):
    """carbonapi_spark modules imported anywhere under an AST node."""
    import ast
    mods = set()
    for n in ast.walk(node):
        if isinstance(n, ast.ImportFrom) and n.module \
                and n.module.startswith("carbonapi_spark"):
            mods.add(n.module)
        elif isinstance(n, ast.Import):
            for a in n.names:
                if a.name.startswith("carbonapi_spark"):
                    mods.add(a.name)
    return mods


def module_deps():
    """module -> set of carbonapi_spark modules it imports directly."""
    deps = {}
    pkg = os.path.join(REPO, "carbonapi_spark")
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)[:-3]
        mod = rel.replace(os.sep, ".")
        if mod.endswith(".__init__"):
            mod = mod[:-len(".__init__")]
        try:
            deps[mod] = _local_imports(_ast_of(path))
        except SyntaxError:
            deps[mod] = set()
    return deps


def _closure(mods, deps):
    out, work = set(), list(mods)
    while work:
        m = work.pop()
        if m in out:
            continue
        out.add(m)
        work.extend(deps.get(m, ()))
        # "from carbonapi_spark.datapipe.similarity import f" also
        # depends on the parent packages' __init__ side effects
        while "." in m:
            m = m.rsplit(".", 1)[0]
            if m in deps and m not in out:
                work.append(m)
    return out


def entry_modules():
    """entry name -> transitive set of carbonapi_spark modules its
    queries() callable runs through.

    Entry functions in entry_queries.py import their operators locally
    (``from carbonapi_spark.datapipe.x import op`` inside the def), so
    the per-entry direct set is read from the function's AST, chasing
    calls to sibling helpers (e.g. ann_quality -> _q_ivf_topk).
    Entries registered through ``graphite_query(target)`` instead run
    the full evaluator stack and get _EVALUATOR_PREFIXES."""
    import ast
    tree = _ast_of(os.path.join(REPO, "carbonapi_spark",
                                "entry_queries.py"))
    funcs = {n.name: n for n in tree.body
             if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))}
    deps = module_deps()

    def mods_of(fname, seen):
        node = funcs.get(fname)
        if node is None or fname in seen:
            return set()
        seen.add(fname)
        mods = _local_imports(node)
        for n in ast.walk(node):
            if isinstance(n, ast.Call) and isinstance(n.func, ast.Name) \
                    and n.func.id in funcs:
                mods |= mods_of(n.func.id, seen)
        return mods

    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id in ("_register", "_g") and node.args
                and isinstance(node.args[0], ast.Constant)):
            continue
        name = node.args[0].value
        if node.func.id == "_g":
            direct = set(_EVALUATOR_PREFIXES)
        else:
            fn = node.args[1]
            if isinstance(fn, ast.Name) and fn.id in funcs:
                direct = mods_of(fn.id, set())
            else:   # graphite_query(...) or other call-expression
                direct = set(_EVALUATOR_PREFIXES) | _local_imports(fn)
        out[name] = _closure(direct, deps)
    return out


def entries_for_changed(paths):
    """Catalog entries whose dependency closure contains any of the
    changed files (repo-relative .py paths or module names)."""
    changed = set()
    for p in paths:
        m = p[:-3] if p.endswith(".py") else p
        m = m.replace("/", ".").replace(os.sep, ".")
        if m.endswith(".__init__"):
            m = m[:-len(".__init__")]
        changed.add(m)
    hits = []
    for name, mods in entry_modules().items():
        # exact module matches; _EVALUATOR_PREFIXES additionally match
        # their submodules (the deliberate coarse shorthand for "runs
        # the whole evaluator stack") — package members in the closure
        # do NOT prefix-match, because importing a package only runs
        # its __init__, whose real re-export deps module_deps() already
        # captured (and carbonapi_spark itself would match everything).
        if changed & mods or any(
                c.startswith(p + ".") for c in changed
                for p in mods if p in _EVALUATOR_PREFIXES):
            hits.append(name)
    return hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30,
                    help="how many longest-unverified entries to print")
    ap.add_argument("--markdown", action="store_true",
                    help="emit the full table for COVERAGE.md")
    ap.add_argument("--changed", nargs="+", metavar="FILE",
                    help="changed engine files (e.g. carbonapi_spark/"
                         "datapipe/similarity.py): print the catalog "
                         "entries whose transitive dependency closure "
                         "contains them, with each entry's last green "
                         "round — the round's must-verify set")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from carbonapi_spark.entry_queries import QUERIES

    lg = last_green(load_history())

    if args.changed:
        hits = [n for n in entries_for_changed(args.changed)
                if n in QUERIES]
        hits.sort(key=lambda n: lg.get(n, 0))
        print(f"# {len(hits)} catalog entries depend on the changed "
              f"files (must-verify, oldest driver row first):")
        for n in hits:
            rnd = lg.get(n, 0)
            print(f"  {'r%02d' % rnd if rnd else 'never'}  {n}")
        return
    catalog = list(QUERIES)
    rows = sorted(((lg.get(n, 0), n) for n in catalog),
                  key=lambda t: (t[0], catalog.index(t[1])))

    if args.markdown:
        print("| entry | last driver-green round |")
        print("|---|---|")
        for rnd, name in rows:
            print(f"| {name} | {'r%02d' % rnd if rnd else 'never'} |")
        return

    never = [n for rnd, n in rows if rnd == 0]
    if never:
        print(f"# {len(never)} catalog entries NEVER driver-green:")
        for n in never:
            print(f"  {n}")
    print(f"# {args.n} longest-unverified catalog entries "
          f"(last green round, oldest first):")
    for rnd, name in rows[:args.n]:
        print(f"  r{rnd:02d}  {name}")


if __name__ == "__main__":
    main()
