"""Compiled-sharding audit: census the collectives GSPMD placed in an
optimized program and assert the data-parallel contract of the walk.

Why: on a mesh, a single wrong sharding annotation makes GSPMD silently
all-gather activations onto every device — the program stays *correct*
and the tiny-shape dryrun still passes, but the x8 scaling evaporates on
real hardware. The reference's torch.nn.DataParallel scatter/gather
(util_latent_aug.py:20-33) had the same failure mode in the opposite
direction (implicit full gathers every step, by design). Auditing the
optimized HLO pins our contract: batch dim sharded end-to-end, and the
only collectives are the small reductions the math requires (batch-mean
losses, replicated-gradient sums) plus bookkeeping-size gathers.

Used by __graft_entry__.dryrun_multichip (prints the census, hard-fails
on violations) and tests/test_sharding_audit.py.
"""

import re

# result-shape(s) then opcode, e.g.
#   %ag = f32[16,2,32,32]{3,2,1,0} all-gather(%p), ...   (layout suffix!)
#   %ar = (f32[], f32[64]) all-reduce(...)
#   %as = (f32[16]{0:T(8,128)S(1)}, f32[128]{0:T(8,128)}) all-gather-start(...)
# Non-scalar results print a {layout} suffix, and on real TPU the layout
# itself contains parens/colons (tiling `T(8,128)`, memory space `S(1)`),
# so the shape text CANNOT be matched with a "no parens inside" class —
# a census doing that silently ignores every tuple-shaped / async
# collective on hardware (caught by tests/test_sharding_audit.py).
# Instead: lazily capture everything between `= ` and the opcode token
# on the instruction's line (HLO prints one instruction per line).
_COLLECTIVE_RE = re.compile(
    r"=\s+(.*?)\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(-start|-done)?\(")
_SHAPE_RE = re.compile(r"(?:[a-z0-9]+\[([\d,]*)\])(?=[{,) ]|$)")


def _elements(shape_text):
    """Total elements across every tensor in a (possibly tuple) shape.

    Layout suffixes like {3,2,1,0:T(8,128)} contain no `type[dims]`
    tokens, so _SHAPE_RE counts only the real tensor shapes."""
    total = 0
    for dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n
    return total


def collective_census(hlo_text):
    """{opcode: [result_element_counts]} for every collective in the
    optimized HLO text (pass `compiled.as_text()`).

    Async pairs are counted once: the `-done` half is skipped (its
    result repeats the `-start`'s payload shape)."""
    census = {}
    for shape_text, op, phase in _COLLECTIVE_RE.findall(hlo_text):
        if phase == "-done":
            continue
        census.setdefault(op, []).append(_elements(shape_text))
    return census


def format_census(census):
    if not census:
        return "no collectives"
    parts = []
    for op in sorted(census):
        sizes = census[op]
        parts.append(f"{op}: {len(sizes)} (max {max(sizes)} elem)")
    return ", ".join(parts)


def audit_walk_collectives(census, *, max_gather_elements=1024,
                           max_reduce_elements=1 << 22):
    """Raise AssertionError when the census shows the data-parallel
    contract was broken.

    - The walk's math needs NO gathers at all (inputs, Adam state, and
      outputs stay batch-sharded; manifold buffers are replicated), so
      any all-gather / all-to-all / collective-permute beyond trivial
      bookkeeping (> 1024 elements — RNG keys, scalars) means the batch
      dim was de-sharded mid-walk. The ceiling must stay below the
      SMALLEST activation at dryrun shapes (a 4²×64ch×B=16 block is
      16384 elements; the dryrun's final image 32768) — a 64k ceiling
      would silently pass a de-sharded low-res program (round-3 review).
    - all-reduce is expected (batch-mean loss terms, replicated-operand
      gradient sums) but must stay far below activation size.
    Returns the census for chaining."""
    problems = []
    for op in ("all-gather", "all-to-all", "collective-permute"):
        for n in census.get(op, []):
            if n > max_gather_elements:
                problems.append(
                    f"{op} of {n} elements — an activation/batch tensor was "
                    "gathered onto every device; the batch dim is not "
                    "sharded end-to-end")
    for n in census.get("all-reduce", []):
        if n > max_reduce_elements:
            problems.append(
                f"all-reduce of {n} elements — larger than any loss/grad "
                "reduction the walk's math needs")
    if problems:
        raise AssertionError(
            "sharding audit failed:\n  " + "\n  ".join(problems)
            + f"\n  census: {format_census(census)}")
    return census


def audit_compiled_walk(compiled, **limits):
    """Census + audit one jax `Compiled` object; returns the census."""
    return audit_walk_collectives(collective_census(compiled.as_text()),
                                  **limits)


def flops_per_device(compiled):
    """XLA's FLOP estimate for one jax `Compiled` object.

    GSPMD compiles a single per-device program, so on a sharded
    executable `cost_analysis()['flops']` is the work ONE device does —
    verified on a virtual mesh: an f32[64,256]@[256,256] pipeline
    reports exactly 1/N of the single-device figure at N=2/4/8."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returned [dict]
        ca = ca[0]
    return float(ca.get("flops", -1.0))


def audit_flops_scaling(sharded_compiled, single_compiled, n_devices, *,
                        tol=1.2, label=""):
    """Assert the sharded program's per-device FLOPs are ~1/N of the
    single-device program at the same global shapes.

    This is the check the collective census CANNOT make: a program that
    replicates compute on every device (e.g. a pmap-of-full-batch bug,
    or a sharding annotation GSPMD resolves by replicating the batch)
    can be collective-clean yet do N× the work — correct output, zero
    scaling. Per-partition FLOPs ≈ single/N is the only scaling
    assertion available without N real chips (round-3 VERDICT #3;
    replaces the DataParallel contract at ref util_latent_aug.py:20-33).

    Returns (per_device, single) for reporting. If the backend reports
    no flops (either count non-positive) the gate CANNOT run: a loud
    warning is printed and the sentinel counts are returned so the
    caller's output shows 'audit skipped', never a fake measurement."""
    import sys

    per_dev = flops_per_device(sharded_compiled)
    single = flops_per_device(single_compiled)
    if per_dev < 0 or single <= 0:
        print(f"WARNING: flops scaling audit SKIPPED"
              f"{' (' + label + ')' if label else ''} — backend reports "
              f"no flops (per_device={per_dev}, single={single}); the "
              "replicated-compute gate did not run", file=sys.stderr)
        return per_dev, single
    ratio = per_dev / (single / n_devices)
    assert ratio <= tol, (
        f"flops scaling audit failed{' (' + label + ')' if label else ''}: "
        f"per-device flops {per_dev:.3g} is {ratio:.2f}x the ideal "
        f"single/{n_devices} = {single / n_devices:.3g} — compute is "
        "replicated across the mesh instead of partitioned")
    return per_dev, single
