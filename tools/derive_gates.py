#!/usr/bin/env python
"""Derive decode-call gates from decoder source (AST analysis).

A gate ``(min_rows, min_bits[, max_rows])`` states NECESSARY conditions for
a decoder to emit an event; the fast dispatch (decoders/base.py) skips the
Python call when a sliced bitbuffer can't meet them. Rules are deliberately
narrow — only guards that provably run before any event can be produced:

Rule A — leading guards: top-level `if <len-cond>: return <fail>` statements
  in the prefix of the function (before any other control flow), where the
  condition is a comparison on bits.num_rows, bits.bits_per_row[...] or the
  result of bits.find_repeated_row(R, K).  An `or` of such conditions makes
  every branch necessary (`if a or b: return` => not-a AND not-b on any
  event path); `and` conditions are skipped.

Rule B — per-row loops: functions whose every Event construction sits inside
  a single `for <row> in range(bits.num_rows)` loop that *starts* with a
  row-length `continue`/`break` guard; the row bound implies a longest-row
  bound (if any event needs a row with >= K bits, the longest row has >= K).

Run:  python tools/derive_gates.py [--check]
  --check  re-derive and report conflicts with the committed GATES
           (a committed gate STRICTER than the derivation is fine — those
           came from manual source reading; a derivation stricter than a
           committed gate is a red flag worth auditing).
"""

import ast
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtl_433_tpu.decoders.base import Registry  # noqa: E402


class Gate:
    def __init__(self):
        self.min_rows = 0
        self.min_bits = 0
        self.max_rows = None

    def merge_min_rows(self, k):
        self.min_rows = max(self.min_rows, k)

    def merge_min_bits(self, k):
        self.min_bits = max(self.min_bits, k)

    def merge_max_rows(self, k):
        self.max_rows = k if self.max_rows is None else min(self.max_rows, k)

    def tup(self):
        if self.max_rows is not None:
            return (self.min_rows, self.min_bits, self.max_rows)
        return (self.min_rows, self.min_bits)

    def nontrivial(self):
        return self.min_rows > 1 or self.min_bits > 0 or \
            self.max_rows is not None


def _const_int(node):
    if isinstance(node, ast.Constant) and isinstance(node.value, int):
        return node.value
    # simple arithmetic on constants, e.g. 22 * 8
    if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Mult, ast.Add,
                                                            ast.Sub)):
        a, b = _const_int(node.left), _const_int(node.right)
        if a is None or b is None:
            return None
        if isinstance(node.op, ast.Mult):
            return a * b
        if isinstance(node.op, ast.Add):
            return a + b
        return a - b
    return None


def _is_attr(node, obj, attr):
    return (isinstance(node, ast.Attribute) and node.attr == attr
            and isinstance(node.value, ast.Name) and node.value.id == obj)


def _is_bpr_sub(node, bits_name):
    """bits.bits_per_row[<anything>]"""
    return (isinstance(node, ast.Subscript)
            and _is_attr(node.value, bits_name, "bits_per_row"))


def _guard_constraints(cond, bits_name, frr_vars, row_len_vars=None,
                       nonneg_names=()):
    """Constraints implied by `if cond: <fail>` => NOT cond is necessary.

    Returns list of ('min_rows'|'min_bits'|'max_rows', k) or None if the
    condition involves anything we can't prove is a pure length check.
    ``row_len_vars`` maps local variables proven equal to a row bit length
    divided by ``scale`` (e.g. a byte length has scale 8).
    ``nonneg_names`` are locals proven >= 0 (search positions): a guard
    `pos + K > bits.bits_per_row[j]` then implies min_bits K.
    """
    row_len_vars = row_len_vars or {}
    if isinstance(cond, ast.BoolOp) and isinstance(cond.op, ast.Or):
        out = []
        for v in cond.values:
            c = _guard_constraints(v, bits_name, frr_vars, row_len_vars,
                                   nonneg_names)
            if c is None:
                return None
            out += c
        return out
    if not isinstance(cond, ast.Compare) or len(cond.ops) != 1:
        return None
    lhs, op, rhs = cond.left, cond.ops[0], cond.comparators[0]
    k = _const_int(rhs)
    # find_repeated_row result guard: r < 0
    if isinstance(lhs, ast.Name) and lhs.id in frr_vars and k == 0 \
            and isinstance(op, ast.Lt):
        r_rows, r_bits = frr_vars[lhs.id]
        return [("min_rows", r_rows), ("min_bits", r_bits)]
    # pos + K > bits.bits_per_row[j]  (pos >= 0)  =>  min_bits K
    if isinstance(op, (ast.Gt, ast.GtE)) and _is_bpr_sub(rhs, bits_name) \
            and isinstance(lhs, ast.BinOp) and isinstance(lhs.op, ast.Add):
        a, b = lhs.left, lhs.right
        kk = _const_int(b) if _const_int(b) is not None else _const_int(a)
        nm = a if _const_int(b) is not None else b
        if kk is not None and isinstance(nm, ast.Name) \
                and nm.id in nonneg_names:
            # fail on `pos+K > bpr` => bpr >= pos+K >= K;
            # fail on `pos+K >= bpr` => bpr > pos+K => bpr >= K+1
            return [("min_bits", kk if isinstance(op, ast.Gt) else kk + 1)]
    if k is None:
        return None
    if _is_attr(lhs, bits_name, "num_rows"):
        if isinstance(op, ast.Lt):
            return [("min_rows", k)]
        if isinstance(op, ast.LtE):
            return [("min_rows", k + 1)]
        if isinstance(op, ast.NotEq):
            return [("min_rows", k), ("max_rows", k)]
        if isinstance(op, ast.Gt):
            return [("max_rows", k)]
        if isinstance(op, ast.GtE):
            return [("max_rows", k - 1)]
        return None
    scale = 1
    is_len = _is_bpr_sub(lhs, bits_name)
    if not is_len and isinstance(lhs, ast.Name) and lhs.id in row_len_vars:
        is_len = True
        scale = row_len_vars[lhs.id]
    if is_len:
        if isinstance(op, ast.Lt):
            return [("min_bits", k * scale)]
        if isinstance(op, ast.LtE):
            return [("min_bits", k * scale + 1)]
        if isinstance(op, ast.NotEq):
            return [("min_bits", k * scale)]  # upper bound not expressible
        return []  # >-style guards bound above only; no lower constraint
    return None


def _track_row_len(st, bits_name, row_len_vars):
    """Record `x = bits.bits_per_row[...]` / `... // 8` assignments;
    a reassignment to anything else evicts the stale tracking.
    Returns True when the statement defined a tracked length variable."""
    if not isinstance(st, ast.Assign):
        return False
    if len(st.targets) != 1 or not isinstance(st.targets[0], ast.Name):
        for t in st.targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    row_len_vars.pop(n.id, None)
        return False
    name, v = st.targets[0].id, st.value
    if _is_bpr_sub(v, bits_name):
        row_len_vars[name] = 1
        return True
    if isinstance(v, ast.BinOp) and isinstance(v.op, ast.FloorDiv) \
            and _is_bpr_sub(v.left, bits_name):
        d = _const_int(v.right)
        if d and d > 0:
            row_len_vars[name] = d
            return True
    row_len_vars.pop(name, None)
    return False


def _nonneg_names(fdef, bits_name):
    """Locals provably >= 0 throughout: every assignment is a constant
    >= 0, a bits.search(...) result (>= 0 by contract), or self + a
    non-negative constant."""
    cand = {}
    for n in ast.walk(fdef):
        if isinstance(n, ast.Assign) and not (
                len(n.targets) == 1 and isinstance(n.targets[0], ast.Name)):
            for t in n.targets:           # tuple unpacking: unprovable
                for sub in ast.walk(t):
                    if isinstance(sub, ast.Name):
                        cand[sub.id] = False
        elif isinstance(n, ast.NamedExpr) and isinstance(n.target, ast.Name):
            cand[n.target.id] = False
        elif isinstance(n, ast.For) and not isinstance(n.target, ast.Name):
            for sub in ast.walk(n.target):
                if isinstance(sub, ast.Name):
                    cand[sub.id] = False
        elif isinstance(n, ast.Assign) and len(n.targets) == 1 \
                and isinstance(n.targets[0], ast.Name):
            nm, v = n.targets[0].id, n.value
            ok = ((_const_int(v) is not None and _const_int(v) >= 0)
                  or (isinstance(v, ast.Call)
                      and isinstance(v.func, ast.Attribute)
                      and v.func.attr == "search"
                      and isinstance(v.func.value, ast.Name)
                      and v.func.value.id == bits_name)
                  or (isinstance(v, ast.BinOp) and isinstance(v.op, ast.Add)
                      and isinstance(v.left, ast.Name) and v.left.id == nm
                      and (_const_int(v.right) or -1) >= 0))
            cand[nm] = cand.get(nm, True) and ok
        elif isinstance(n, ast.AugAssign) and isinstance(n.target, ast.Name):
            nm = n.target.id
            ok = isinstance(n.op, ast.Add) and \
                (_const_int(n.value) or -1) >= 0
            cand[nm] = cand.get(nm, True) and ok
        elif isinstance(n, (ast.For,)) and isinstance(n.target, ast.Name):
            # loop targets: non-negative only for range(...) iterables
            nm = n.target.id
            ok = (isinstance(n.iter, ast.Call)
                  and isinstance(n.iter.func, ast.Name)
                  and n.iter.func.id == "range"
                  and len(n.iter.args) == 1)
            cand[nm] = cand.get(nm, True) and ok
    return {nm for nm, ok in cand.items() if ok}


def _is_fail_return(body):
    """Body is a bare `return <Name/Constant/-Constant>` — i.e. a fail
    code, never an event list. A `return <Call>` does NOT qualify: a
    delegated helper may produce events."""
    if len(body) != 1 or not isinstance(body[0], ast.Return):
        return False
    v = body[0].value
    if isinstance(v, (ast.Name, ast.Constant)):
        return True
    return isinstance(v, ast.UnaryOp) and isinstance(v.operand, ast.Constant)


def derive(fn, depth=0):
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        return None
    tree = ast.parse(src)
    fdef = tree.body[0]
    if not isinstance(fdef, (ast.FunctionDef, ast.AsyncFunctionDef)):
        return None
    args = fdef.args.args
    if not args:
        return None
    bits_name = args[0].arg
    gate = Gate()
    frr_vars = {}
    row_len_vars = {}

    # ---- Rule A: prefix guards
    prefix_ok = True
    for st in fdef.body:
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Constant):
            continue  # docstring
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Call):
            c = st.value
            # allowed no-op-for-length calls: bits.invert(), bits.reflect...
            if isinstance(c.func, ast.Attribute) and \
                    isinstance(c.func.value, ast.Name) and \
                    c.func.value.id == bits_name and \
                    c.func.attr in ("invert",):
                continue
            prefix_ok = False
        elif isinstance(st, ast.Return) and depth < 3:
            # Rule D — pure delegation: `return _helper(bits, ...)` (a
            # family wrapper); the helper's prefix guards are necessary
            # for the wrapper regardless of the extra constant args.
            v = st.value
            if isinstance(v, ast.Call) and isinstance(v.func, ast.Name) \
                    and v.args and isinstance(v.args[0], ast.Name) \
                    and v.args[0].id == bits_name:
                helper = getattr(fn, "__globals__", {}).get(v.func.id)
                if helper is not None:
                    sub = derive(helper, depth + 1)
                    if sub is not None:
                        gate.merge_min_rows(sub.min_rows)
                        gate.merge_min_bits(sub.min_bits)
                        if sub.max_rows is not None:
                            gate.merge_max_rows(sub.max_rows)
            prefix_ok = False
        elif isinstance(st, ast.Assign):
            # r = bits.find_repeated_row(R, K)
            v = st.value
            if isinstance(v, ast.Call) and _is_attr(v.func, bits_name,
                                                    "find_repeated_row") \
                    and len(v.args) >= 2 and len(st.targets) == 1 \
                    and isinstance(st.targets[0], ast.Name):
                rr, kk = _const_int(v.args[0]), _const_int(v.args[1])
                if rr is not None and kk is not None:
                    frr_vars[st.targets[0].id] = (rr, kk)
                    continue
            _track_row_len(st, bits_name, row_len_vars)
            # other assignments are fine as long as they don't hide control
            continue
        elif isinstance(st, ast.If):
            cons = _guard_constraints(st.test, bits_name, frr_vars,
                                      row_len_vars)
            if cons is not None and _is_fail_return(st.body) and not st.orelse:
                for kind, k in cons:
                    getattr(gate, "merge_" + kind)(k)
                continue
            prefix_ok = False
        else:
            prefix_ok = False
        if not prefix_ok:
            break

    # ---- Rule B: single row loop with a leading length guard
    if not gate.nontrivial():
        _rule_b(fdef, bits_name, gate)

    # ---- Rule C: search loops guarded by `pos + K > bits_per_row[j]`
    if not gate.nontrivial():
        _rule_c(fdef, bits_name, gate)

    return gate


def _rule_b(fdef, bits_name, gate):
    loops = [st for st in ast.walk(fdef) if isinstance(st, ast.For)]
    events = [n for n in ast.walk(fdef)
              if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
              and n.func.attr == "make"
              and isinstance(n.func.value, ast.Name)
              and n.func.value.id == "Event"]
    if not events or len(loops) < 1:
        return
    # the loop must be `for <v> in range(bits.num_rows)`
    loop = loops[0]
    it = loop.iter
    if not (isinstance(it, ast.Call) and isinstance(it.func, ast.Name)
            and it.func.id == "range" and len(it.args) == 1
            and _is_attr(it.args[0], bits_name, "num_rows")):
        return
    if not isinstance(loop.target, ast.Name):
        return
    row_var = loop.target.id
    # every Event.make must be inside this loop
    loop_lines = (loop.lineno, max(n.lineno for n in ast.walk(loop)
                                   if hasattr(n, "lineno")))
    if not all(loop_lines[0] <= e.lineno <= loop_lines[1] for e in events):
        return
    # leading guard(s) in the loop body: continue/break on row length
    row_len_vars = {}
    for st in loop.body:
        if isinstance(st, ast.Assign):
            _track_row_len(st, bits_name, row_len_vars)
            continue
        if isinstance(st, ast.If) and len(st.body) == 1 and \
                isinstance(st.body[0], (ast.Continue, ast.Break)) and \
                not st.orelse:
            cons = _guard_constraints(st.test, bits_name, {}, row_len_vars)
            if cons:
                for kind, k in cons:
                    if kind == "min_bits":
                        gate.merge_min_bits(k)
            continue
        break  # stop at the first non-guard statement


def _rule_c(fdef, bits_name, gate):
    """Search-loop decoders (e.g. a preamble scan): every Event.make sits
    inside a loop whose leading guard breaks/returns on a failed length
    check — `pos + K > bits.bits_per_row[j]` (pos provably >= 0) or
    `start >= bits.bits_per_row[j]` where start is a K-bit search result
    (not-found returns the row length) — so any event requires a row of
    at least K bits."""
    events = [n for n in ast.walk(fdef)
              if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
              and n.func.attr == "make"
              and isinstance(n.func.value, ast.Name)
              and n.func.value.id == "Event"]
    if not events:
        return
    nonneg = _nonneg_names(fdef, bits_name)
    for loop in ast.walk(fdef):
        if not isinstance(loop, (ast.For, ast.While)):
            continue
        span = (loop.lineno, max(n.lineno for n in ast.walk(loop)
                                 if hasattr(n, "lineno")))
        if not all(span[0] <= e.lineno <= span[1] for e in events):
            continue
        # leading statements: assignments, then the length guard
        search_vars = {}
        for st in loop.body:
            if isinstance(st, ast.Assign):
                # start = bits.search(row, S, pattern, K)
                if len(st.targets) == 1 \
                        and isinstance(st.targets[0], ast.Name):
                    v = st.value
                    if isinstance(v, ast.Call) \
                            and _is_attr(v.func, bits_name, "search") \
                            and len(v.args) == 4 \
                            and _const_int(v.args[3]) is not None:
                        search_vars[st.targets[0].id] = \
                            _const_int(v.args[3])
                        continue
                    search_vars.pop(st.targets[0].id, None)
                continue
            if isinstance(st, ast.If) and not st.orelse and (
                    (len(st.body) == 1
                     and isinstance(st.body[0], (ast.Break, ast.Continue)))
                    or _is_fail_return(st.body)):
                if all(e.lineno > st.lineno for e in events):
                    cons = _guard_constraints(st.test, bits_name, {}, {},
                                              nonneg)
                    for kind, k in (cons or []):
                        if kind == "min_bits":
                            gate.merge_min_bits(k)
                    # start >= bits.bits_per_row[j]: not-found sentinel
                    t = st.test
                    if isinstance(t, ast.Compare) and len(t.ops) == 1 \
                            and isinstance(t.ops[0], (ast.GtE, ast.Gt)) \
                            and isinstance(t.left, ast.Name) \
                            and t.left.id in search_vars \
                            and _is_bpr_sub(t.comparators[0], bits_name):
                        gate.merge_min_bits(search_vars[t.left.id])
                continue
            break
        if gate.nontrivial():
            return


def main():
    check = "--check" in sys.argv
    reg = Registry()
    devs = [d for d in reg.slots if d is not None and d.decode_fn]
    from rtl_433_tpu.decoders.gates import GATES, MANUAL_GATES
    derived = {}
    for d in devs:
        g = derive(d.decode_fn)
        if g and g.nontrivial():
            derived[d.symbol] = g.tup()
    print(f"derived {len(derived)} / {len(devs)}")
    conflicts = []
    news = {}
    for sym, tup in sorted(derived.items()):
        old = GATES.get(sym)
        if sym in MANUAL_GATES:
            continue
        if old is None:
            news[sym] = tup
            continue
        # derivation stricter than committed gate => suspicious
        if tup[0] > old[0] or tup[1] > old[1]:
            conflicts.append((sym, old, tup))
    if check:
        print(f"committed={len(GATES)}  new={len(news)}  "
              f"stricter-derivations={len(conflicts)}")
        for sym, old, new in conflicts:
            print(f"  CONFLICT {sym}: committed={old} derived={new}")
    else:
        for sym, tup in sorted(news.items()):
            print(f"    '{sym}': {tup},")


if __name__ == "__main__":
    main()
