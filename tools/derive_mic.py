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
    if len(body) != 1 or not isinstance(body[0], ast.Return):
        return False
    v = body[0].value
    return v is not None and not isinstance(v, (ast.List, ast.ListComp))


def _row_bytes_src(v, bits_name, row_names):
    """_ints(bits.bb[r]) / _ints(bits.extract_bytes(r, 0, L)) -> row
    (int row index, or -1 for a variable/any row) or None."""
    if not (isinstance(v, ast.Call) and isinstance(v.func, ast.Name)
            and v.func.id == "_ints" and len(v.args) == 1):
        return None
    a = v.args[0]
    if isinstance(a, ast.Subscript) and _is_attr(a.value, bits_name, "bb"):
        idx = a.slice
    elif (isinstance(a, ast.Call)
          and _is_attr(a.func, bits_name, "extract_bytes")
          and len(a.args) == 3 and _const_int(a.args[1]) == 0):
        idx = a.args[0]
    else:
        return None
    k = _const_int(idx)
    if k is not None:
        return k
    if isinstance(idx, ast.Name) and idx.id in row_names:
        return -1
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


def _derive_prefix(fdef, bits_name):
    invert = False
    b_name = None
    b_row = None
    row_names = set()
    digest_vars = {}
    checks = []
    for st in fdef.body:
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Constant):
            continue  # docstring
        if isinstance(st, ast.Expr) and isinstance(st.value, ast.Call):
            c = st.value
            if isinstance(c.func, ast.Attribute) and \
                    isinstance(c.func.value, ast.Name) and \
                    c.func.value.id == bits_name and \
                    c.func.attr == "invert" and not c.args:
                if b_name is not None:
                    break  # invert after extraction: bytes already taken
                invert = True
                continue
            break
        if isinstance(st, ast.Assign):
            if len(st.targets) != 1 or not isinstance(st.targets[0],
                                                      ast.Name):
                continue
            tgt = st.targets[0].id
            v = st.value
            if (isinstance(v, ast.Call)
                    and _is_attr(v.func, bits_name, "find_repeated_row")):
                row_names.add(tgt)
                continue
            row = _row_bytes_src(v, bits_name, row_names)
            if row is not None:
                b_name, b_row = tgt, row
                continue
            d = _digest_core(v, b_name) if b_name else None
            if d is not None:
                digest_vars[tgt] = d
                continue
            if b_name is not None and tgt == b_name:
                if _is_pad_noop(v, b_name):
                    continue
                b_name = None  # b reassigned to something else
            if tgt in digest_vars:
                del digest_vars[tgt]
            continue
        if isinstance(st, ast.If):
            if _is_fail_return(st.body) and not st.orelse:
                if b_name is not None:
                    checks += _checks_from_guard(st.test, b_name,
                                                 digest_vars)
                continue
            break
        break
    if checks:
        return (b_row, invert, tuple(checks))
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
    row_names = {loop.target.id}
    b_name = None
    digest_vars = {}
    checks = []
    for st in loop.body:
        if isinstance(st, ast.Assign):
            if len(st.targets) != 1 or not isinstance(st.targets[0],
                                                      ast.Name):
                continue
            tgt = st.targets[0].id
            row = _row_bytes_src(st.value, bits_name, row_names)
            if row is not None:
                b_name = tgt
                continue
            d = _digest_core(st.value, b_name) if b_name else None
            if d is not None:
                digest_vars[tgt] = d
                continue
            if b_name is not None and tgt == b_name:
                if _is_pad_noop(st.value, b_name):
                    continue
                b_name = None
            continue
        if isinstance(st, ast.If) and len(st.body) == 1 and \
                isinstance(st.body[0], (ast.Continue, ast.Break)) and \
                not st.orelse:
            if b_name is not None:
                checks += _checks_from_guard(st.test, b_name, digest_vars)
            continue
        break
    if checks:
        return (-1, False, tuple(checks))
    return None


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
