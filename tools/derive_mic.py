#!/usr/bin/env python
"""Derive MIC (checksum) gates from decoder source (AST analysis).

A MIC gate states NECESSARY checksum conditions for a decoder to emit an
event: "some candidate row's byte prefix passes every derived digest
check".  The dispatch evaluates gates for candidate (package, decoder)
pairs in batched kernel calls (ops/mic.py) and skips the Python decode
call when no row can pass — the decoder would have returned
DECODE_FAIL_MIC (accounted as such).

Only provably-necessary patterns are derived, from the decode function's
statement prefix (same discipline as tools/derive_gates.py) or from the
single all-events row loop:

  b = _ints(bits.bb[r])                  # r: const, loop var, or
  b = _ints(bits.extract_bytes(r, 0, L)) #   find_repeated_row result
  b = (b + [0] * k)[:K]                  # zero-pad no-op (storage is
                                         #   already zero-padded)
  [bits.invert() in the prefix sets the invert flag]
  if <mic-cond> [or <mic-cond> ...]: return <fail>      # prefix form
  if <mic-cond>: continue                               # row-loop form

  mic-cond:
    util.<digest>(bytes(b[:K]), K, P1, P2) [^ X] [& M] != <expected>
    sum(b[:K]) & M != <expected>
    util.<digest>(...)                  # truthy: digest must be 0
    <name> != <expected>                # name = tracked digest assignment

  expected: b[K] | (b[K] << 8 | b[K+1]) | integer constant

Each ``or`` disjunct of a fail guard is independently necessary
(NOT(a or b) = NOT a AND NOT b), so every parsed disjunct tightens the
gate even when its siblings don't parse.

Emitted per-decoder spec: (row, invert, checks) where row is -1 ("any
row") or a fixed row index, and each check is
(algo, nbytes, p1, p2, xor_out, mask, cmp, cmp_const):
  cmp >= 0 -> (digest ^ xor_out) & mask == row[cmp] (16-bit algos compare
              (row[cmp]<<8)|row[cmp+1] when cmp_const is None)
  cmp == -1 -> (digest ^ xor_out) & mask == cmp_const

Run:  python tools/derive_mic.py          # print derived table
      python tools/derive_mic.py --stats  # coverage summary
"""

import ast
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtl_433_tpu.decoders.base import Registry  # noqa: E402
from derive_gates import _const_int, _is_attr  # noqa: E402

DIGESTS8 = {"crc8", "crc8le", "lfsr_digest8", "lfsr_digest8_reverse",
            "lfsr_digest8_reflect"}
DIGESTS16 = {"crc16", "crc16lsb", "lfsr_digest16"}
SUMS = {"add_bytes", "xor_bytes", "add_nibbles", "parity_bytes"}
ALL_ALGOS = DIGESTS8 | DIGESTS16 | SUMS


def _is_b_slice(node, b_name):
    """bytes(b[:K]) / bytes(b) -> K (or -1 for whole-b)"""
    if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
            and node.func.id == "bytes" and len(node.args) == 1):
        return None
    a = node.args[0]
    if isinstance(a, ast.Name) and a.id == b_name:
        return -1
    k = _bare_slice(a, b_name)
    return k


def _bare_slice(node, b_name):
    """b[:K] -> K"""
    if (isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name)
            and node.value.id == b_name and isinstance(node.slice, ast.Slice)
            and node.slice.lower is None and node.slice.step is None):
        return _const_int(node.slice.upper)
    return None


def _b_index(node, b_name):
    """b[K] -> K"""
    if (isinstance(node, ast.Subscript) and isinstance(node.value, ast.Name)
            and node.value.id == b_name
            and not isinstance(node.slice, ast.Slice)):
        return _const_int(node.slice)
    return None


def _b_index16(node, b_name):
    """(b[K] << 8) | b[K+1] -> K"""
    if not (isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitOr)):
        return None
    lhs, rhs = node.left, node.right
    if not (isinstance(lhs, ast.BinOp) and isinstance(lhs.op, ast.LShift)
            and _const_int(lhs.right) == 8):
        return None
    k = _b_index(lhs.left, b_name)
    k2 = _b_index(rhs, b_name)
    if k is not None and k2 == k + 1:
        return k
    return None


def _digest_core(node, b_name):
    """util.<algo>(bytes(b[:K]), K, P1, P2) or sum(b[:K]) ->
    (algo, nbytes, p1, p2) or None."""
    if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
            and node.func.id == "sum" and len(node.args) == 1):
        k = _bare_slice(node.args[0], b_name)
        if k is not None and k >= 0:
            return ("add_bytes", k, 0, 0)
        return None
    if not (isinstance(node, ast.Call) and isinstance(node.func,
                                                      ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "util"
            and node.func.attr in ALL_ALGOS):
        return None
    algo = node.func.attr
    if algo in SUMS:
        k_slice = _is_b_slice(node.args[0], b_name) if node.args else None
        nbytes = _const_int(node.args[1]) if len(node.args) > 1 else k_slice
        if k_slice is None or nbytes is None or nbytes < 0:
            return None
        if k_slice != -1 and k_slice < nbytes:
            return None
        return (algo, nbytes, 0, 0)
    if len(node.args) != 4:
        return None
    k_slice = _is_b_slice(node.args[0], b_name)
    nbytes = _const_int(node.args[1])
    p1 = _const_int(node.args[2])
    p2 = _const_int(node.args[3])
    if k_slice is None or nbytes is None or p1 is None or p2 is None:
        return None
    if k_slice != -1 and k_slice < nbytes:
        return None
    return (algo, nbytes, p1, p2)


def _digest_expr(node, b_name, digest_vars):
    """digest-core with optional ^X and &M wrappers (in either order) or a
    tracked local name -> (core, xor_out, mask) or None."""
    xor_out, mask = 0, None
    for _ in range(2):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitXor):
            c = _const_int(node.right)
            if c is None:
                c = _const_int(node.left)
                nxt = node.right
            else:
                nxt = node.left
            if c is None:
                return None
            xor_out ^= c
            node = nxt
            continue
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitAnd):
            c = _const_int(node.right)
            if c is None:
                c = _const_int(node.left)
                nxt = node.right
            else:
                nxt = node.left
            if c is None:
                return None
            mask = c if mask is None else (mask & c)
            node = nxt
            continue
        break
    if isinstance(node, ast.Name) and node.id in digest_vars:
        core = digest_vars[node.id]
    else:
        core = _digest_core(node, b_name)
    if core is None:
        return None
    return core, xor_out, mask


def _check_from_cond(cond, b_name, digest_vars):
    """One fail-guard condition -> check tuple or None.

    `digest != expected` (fail)  => digest == expected necessary
    `digest` truthy (fail)       => digest == 0 necessary
    `not parity` (fail)          => parity == 1 necessary
    """
    if isinstance(cond, ast.Compare) and len(cond.ops) == 1 \
            and isinstance(cond.ops[0], ast.NotEq):
        for lhs, rhs in ((cond.left, cond.comparators[0]),
                         (cond.comparators[0], cond.left)):
            got = _digest_expr(lhs, b_name, digest_vars)
            if got is None:
                continue
            (algo, nbytes, p1, p2), xor_out, mask = got
            cmp_const = _const_int(rhs)
            if cmp_const is not None:
                return (algo, nbytes, p1, p2, xor_out, mask, -1, cmp_const)
            k = _b_index(rhs, b_name)
            if k is not None:
                if algo in DIGESTS16 and mask is None:
                    return None  # 16-bit digest vs one byte: not modeled
                return (algo, nbytes, p1, p2, xor_out, mask, k, None)
            if algo in DIGESTS16:
                k = _b_index16(rhs, b_name)
                if k is not None:
                    return (algo, nbytes, p1, p2, xor_out, mask, k, None)
        return None
    if isinstance(cond, ast.UnaryOp) and isinstance(cond.op, ast.Not):
        got = _digest_expr(cond.operand, b_name, digest_vars)
        if got is None:
            return None
        (algo, nbytes, p1, p2), xor_out, mask = got
        if algo != "parity_bytes" or xor_out or mask is not None:
            return None
        return (algo, nbytes, 0, 0, 0, None, -1, 1)
    got = _digest_expr(cond, b_name, digest_vars)
    if got is not None:
        (algo, nbytes, p1, p2), xor_out, mask = got
        if algo in SUMS:
            return None  # `if sum(..):` fail is a sanity check, not MIC
        return (algo, nbytes, p1, p2, xor_out, mask, -1, 0)
    return None


def _checks_from_guard(cond, b_name, digest_vars):
    """Each `or` disjunct of a fail guard is independently necessary."""
    if isinstance(cond, ast.BoolOp) and isinstance(cond.op, ast.Or):
        out = []
        for v in cond.values:
            c = _check_from_cond(v, b_name, digest_vars)
            if c is not None:
                out.append(c)
        return out
    c = _check_from_cond(cond, b_name, digest_vars)
    return [c] if c is not None else []


def _is_fail_return(body):
    """`return <Name/Constant/-Constant>` only — a `return <Call>` may
    delegate to an event-producing helper (e.g. fineoffset_WH0530's
    63-bit Alecto path) and must NOT count as a fail code."""
    if len(body) != 1 or not isinstance(body[0], ast.Return):
        return False
    v = body[0].value
    if isinstance(v, (ast.Name, ast.Constant)):
        return v is not None
    return isinstance(v, ast.UnaryOp) and isinstance(v.operand, ast.Constant)


def _row_bytes_src(v, bits_name, row_names):
    """_ints(bits.bb[r]) / _ints(bits.extract_bytes(r, OFF, L)) ->
    (row, bit_off) where row is an int index or -1 for a variable/any
    row, or None."""
    if not (isinstance(v, ast.Call) and isinstance(v.func, ast.Name)
            and v.func.id == "_ints" and len(v.args) == 1):
        return None
    a = v.args[0]
    bit_off = 0
    if isinstance(a, ast.Subscript) and _is_attr(a.value, bits_name, "bb"):
        idx = a.slice
    elif (isinstance(a, ast.Call)
          and _is_attr(a.func, bits_name, "extract_bytes")
          and len(a.args) == 3 and _const_int(a.args[1]) is not None
          and _const_int(a.args[1]) >= 0):
        idx = a.args[0]
        bit_off = _const_int(a.args[1])
    else:
        return None
    k = _const_int(idx)
    if k is not None:
        return (k, bit_off)
    if isinstance(idx, ast.Name) and idx.id in row_names:
        return (-1, bit_off)
    return None


def _reflect_src(v, views):
    """[util.reverse8(x) for x in <view>] / ... for x in <view>[:K]] ->
    source view name, or None."""
    if not (isinstance(v, ast.ListComp) and len(v.generators) == 1
            and not v.generators[0].ifs):
        return None
    gen = v.generators[0]
    if not isinstance(gen.target, ast.Name):
        return None
    elt = v.elt
    if not (isinstance(elt, ast.Call) and isinstance(elt.func, ast.Attribute)
            and isinstance(elt.func.value, ast.Name)
            and elt.func.value.id == "util"
            and elt.func.attr == "reverse8" and len(elt.args) == 1
            and isinstance(elt.args[0], ast.Name)
            and elt.args[0].id == gen.target.id):
        return None
    it = gen.iter
    if isinstance(it, ast.Name) and it.id in views:
        return it.id
    if (isinstance(it, ast.Subscript) and isinstance(it.value, ast.Name)
            and it.value.id in views and isinstance(it.slice, ast.Slice)
            and it.slice.lower is None and it.slice.step is None):
        return it.value.id
    return None


def _is_pad_noop(v, b_name):
    """(b + [0] * k)[:K] — a no-op on zero-padded row storage."""
    if not (isinstance(v, ast.Subscript) and isinstance(v.slice, ast.Slice)
            and v.slice.lower is None and v.slice.step is None
            and _const_int(v.slice.upper) is not None):
        return False
    inner = v.value
    return (isinstance(inner, ast.BinOp) and isinstance(inner.op, ast.Add)
            and isinstance(inner.left, ast.Name)
            and inner.left.id == b_name)


def derive(fn):
    """Returns (row, invert, checks-tuple) or None."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        return None
    tree = ast.parse(src)
    fdef = tree.body[0]
    if not isinstance(fdef, ast.FunctionDef) or not fdef.args.args:
        return None
    bits_name = fdef.args.args[0].arg

    got = _derive_prefix(fdef, bits_name)
    if got:
        return got
    return _derive_row_loop(fdef, bits_name)


def _guard_checks_views(cond, views, digest_vars, row_sel):
    """Collect checks across every byte view; each check carries its
    view's (bit_off, reflect). All views must agree on the spec row."""
    out = []
    for name, (row, bit_off, reflect) in views.items():
        if row_sel[0] is not None and row != row_sel[0]:
            continue
        dvars = {k: core for k, (core, vk) in digest_vars.items()
                 if vk == name}
        for c in _checks_from_guard(cond, name, dvars):
            if row_sel[0] is None:
                row_sel[0] = row
            if bit_off or reflect:
                c = c + (bit_off, reflect)
            out.append(c)
    return out


def _track_view_assign(st, bits_name, row_names, views, digest_vars):
    """Process one Assign statement for view/digest tracking. Returns
    True when handled."""
    if len(st.targets) != 1 or not isinstance(st.targets[0], ast.Name):
        return False
    tgt = st.targets[0].id
    v = st.value
    if (isinstance(v, ast.Call)
            and _is_attr(v.func, bits_name, "find_repeated_row")):
        row_names.add(tgt)
        return True
    src = _row_bytes_src(v, bits_name, row_names)
    if src is not None:
        views[tgt] = (src[0], src[1], False)
        digest_vars.pop(tgt, None)
        return True
    ref = _reflect_src(v, views)
    if ref is not None:
        row, bit_off, refl = views[ref]
        views[tgt] = (row, bit_off, not refl)
        digest_vars.pop(tgt, None)
        return True
    for name in views:
        d = _digest_core(v, name)
        if d is not None:
            digest_vars[tgt] = (d, name)
            return True
    if tgt in views:
        if _is_pad_noop(v, tgt):
            return True
        del views[tgt]  # reassigned to something else
    digest_vars.pop(tgt, None)
    return False


def _derive_prefix(fdef, bits_name):
    invert = False
    row_names = set()
    views = {}
    digest_vars = {}
    checks = []
    row_sel = [None]
    for st in fdef.body:
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Constant):
            continue  # docstring
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Call):
            c = st.value
            if isinstance(c.func, ast.Attribute) and \
                    isinstance(c.func.value, ast.Name) and \
                    c.func.value.id == bits_name and \
                    c.func.attr == "invert" and not c.args:
                if views:
                    break  # invert after extraction: bytes already taken
                invert = True
                continue
            break
        if isinstance(st, ast.Assign):
            _track_view_assign(st, bits_name, row_names, views, digest_vars)
            continue
        if isinstance(st, ast.If):
            if _is_fail_return(st.body) and not st.orelse:
                checks += _guard_checks_views(st.test, views, digest_vars,
                                              row_sel)
                continue
            break
        break
    if checks:
        return (row_sel[0], invert, tuple(checks))
    return None


def _derive_row_loop(fdef, bits_name):
    """All events inside one `for r in range(bits.num_rows)` loop whose
    body starts with guard `continue`s — any parsed MIC continue-guard is
    a necessary per-row condition (gate: some row passes)."""
    loops = [st for st in ast.walk(fdef) if isinstance(st, ast.For)]
    events = [n for n in ast.walk(fdef)
              if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
              and n.func.attr == "make"
              and isinstance(n.func.value, ast.Name)
              and n.func.value.id == "Event"]
    if not events or not loops:
        return None
    loop = loops[0]
    it = loop.iter
    if not (isinstance(it, ast.Call) and isinstance(it.func, ast.Name)
            and it.func.id == "range" and len(it.args) == 1
            and _is_attr(it.args[0], bits_name, "num_rows")):
        return None
    if not isinstance(loop.target, ast.Name):
        return None
    span = (loop.lineno, max(n.lineno for n in ast.walk(loop)
                             if hasattr(n, "lineno")))
    if not all(span[0] <= e.lineno <= span[1] for e in events):
        return None
    # the gate evaluates on the bitbuffer as SLICED: any mutation before
    # the loop (invert, majority-vote add_row, row cancellation) changes
    # the bytes the decoder sees, so only a top-level prefix
    # `bits.invert()` is representable — anything else rejects
    invert = False
    mutators = {"invert", "add_row", "add_bit", "add_sync", "clear",
                "crop", "set_bits_per_row"}
    for n in ast.walk(fdef):
        line = getattr(n, "lineno", None)
        if line is None or line >= loop.lineno:
            continue
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute) \
                and isinstance(n.func.value, ast.Name) \
                and n.func.value.id == bits_name \
                and n.func.attr in mutators:
            if n.func.attr == "invert" and any(
                    isinstance(st, ast.Expr) and st.value is n
                    for st in fdef.body):
                invert = True
                continue
            return None
        if isinstance(n, (ast.Assign, ast.AugAssign)):
            tgts = n.targets if isinstance(n, ast.Assign) else [n.target]
            for t in tgts:
                for s in ast.walk(t):
                    if isinstance(s, ast.Attribute) \
                            and isinstance(s.value, ast.Name) \
                            and s.value.id == bits_name:
                        return None  # writes bits storage before the loop

    row_names = {loop.target.id}
    views = {}
    digest_vars = {}
    checks = []
    row_sel = [-1]
    for st in loop.body:
        if isinstance(st, ast.Assign):
            _track_view_assign(st, bits_name, row_names, views, digest_vars)
            continue
        if isinstance(st, ast.If) and not st.orelse \
                and _is_guard_body(st.body, fdef):
            checks += _guard_checks_views(st.test, views, digest_vars,
                                          row_sel)
            continue
        break
    if checks:
        return (-1, invert, tuple(checks))
    return None


def _is_guard_body(body, fdef):
    """`continue`/`break`, optionally preceded by one bookkeeping
    assignment `ret = <code>` whose name provably cannot influence event
    emission (its only other uses are returns or re-assignments)."""
    if len(body) == 1:
        return isinstance(body[0], (ast.Continue, ast.Break))
    if len(body) != 2 or not isinstance(body[1], (ast.Continue, ast.Break)):
        return False
    st = body[0]
    if not (isinstance(st, ast.Assign) and len(st.targets) == 1
            and isinstance(st.targets[0], ast.Name)
            and isinstance(st.value, (ast.Name, ast.Constant, ast.Call))):
        return False
    nm = st.targets[0].id
    # every occurrence of nm must be: an assignment target of a simple
    # `nm = <expr not reading bits data>`, inside such an expr reading
    # only nm itself (e.g. min(nm, X)), or inside a Return
    total = sum(1 for n in ast.walk(fdef)
                if isinstance(n, ast.Name) and n.id == nm)
    sanctioned = 0
    for n in ast.walk(fdef):
        if isinstance(n, ast.Return) and n.value is not None:
            sanctioned += sum(1 for s in ast.walk(n.value)
                              if isinstance(s, ast.Name) and s.id == nm)
        elif isinstance(n, ast.Assign) and len(n.targets) == 1 \
                and isinstance(n.targets[0], ast.Name) \
                and n.targets[0].id == nm:
            sanctioned += 1  # the target itself
            sanctioned += sum(1 for s in ast.walk(n.value)
                              if isinstance(s, ast.Name) and s.id == nm)
    return sanctioned == total


def main():
    reg = Registry()
    devs = [d for d in reg.slots if d is not None and d.decode_fn]
    derived = {}
    for d in devs:
        got = derive(d.decode_fn)
        if got:
            derived[d.symbol] = got
    if "--stats" in sys.argv:
        from collections import Counter
        print(f"derived {len(derived)} / {len(devs)}")
        print(Counter(c[0] for v in derived.values() for c in v[2]))
        return
    for sym in sorted(derived):
        print(f"    {sym!r}: {derived[sym]!r},")


if __name__ == "__main__":
    main()
