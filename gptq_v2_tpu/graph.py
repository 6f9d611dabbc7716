"""Model-agnostic linear-layer dependency extraction via jaxpr analysis.

TPU-native re-design of the reference's autograd-graph machinery
(reference: ``model_utils.py:117-271``): where the reference wraps layers in
``torch.autograd.Function``s, runs a fake-tensor forward, and BFS-walks
``grad_fn.next_functions``, we trace the block once with ``jax.make_jaxpr``
(zero real compute) and read the structure directly off the jaxpr:

* a **linear** is a ``dot_general`` equation whose one operand traces back
  (through pure layout/dtype ops) to a 2-D parameter leaf — the leaf's
  pytree path is the layer name;
* linears whose activation operand is the *same jaxpr var* share identical
  inputs ⇒ share one Hessian (the reference's "equivalence sets",
  ``model_utils.py:179-191``);
* stage order is jaxpr equation order (jaxprs are topologically sorted, so
  no Kahn sort needed — cf. ``model_utils.py:251-271``);
* "direct parents" (reference ``model_utils.py:193-214``) come from a
  dataflow pass that propagates, per var, the set of nearest upstream
  linears (propagation stops at a linear's output), giving the release
  schedule: an entity is released after the stage that quantizes its last
  direct child.

For a Llama block this yields ``[q,k,v] → [o] → [gate,up] → [down]``,
matching the reference's discovered schedule.
"""
from __future__ import annotations

from typing import Callable, Dict, FrozenSet, List, NamedTuple, Sequence, Tuple

import jax
from jax.tree_util import tree_flatten_with_path, keystr

INPUT = "input"
OUTPUT = "output"

# Primitives through which a weight keeps its identity (layout/dtype only).
_PASSTHROUGH = {"convert_element_type", "transpose", "reshape", "copy",
                "broadcast_in_dim", "squeeze", "device_put"}


class Stage(NamedTuple):
    """One quantization stage: linears sharing a Hessian + entities whose
    cached outputs become dead once this stage's Hessian is computed.
    ``parents`` are the nearest upstream linears of the stage's shared
    input (``INPUT`` for block-entry stages) — the quantization-order
    constraint: a stage's Hessian must be captured only after every parent
    is quantized (the v2 error propagation), and stages whose parents are
    all already solved are mutually independent (see :func:`stage_waves`)."""

    linears: Tuple[str, ...]
    release: Tuple[str, ...]
    parents: Tuple[str, ...] = ()


def _leaf_name(path) -> str:
    # keystr gives e.g. "['self_attn.q_proj']" — strip decoration.
    return keystr(path).replace("['", "").replace("']", "").replace(".", "/").replace("/", ".")


def _is_literal(v) -> bool:
    return type(v).__name__ == "Literal"


# Primitives whose presence in a live subgraph marks it "expensive to
# recompute" (MXU work / custom kernels) — used by the incremental
# quantization planner to decide which stage activations are worth caching.
_EXPENSIVE = {"dot_general", "conv_general_dilated", "pallas_call",
              "custom_vjp_call", "custom_jvp_call"}


def analyze_live(jaxpr, outvars) -> Tuple[set, bool]:
    """Backward liveness over a (flat) jaxpr restricted to ``outvars``.

    Returns ``(live_invar_ids, expensive)``: the ``id()``s of jaxpr vars
    (including invars) on which the outputs depend, and whether any live
    equation is MXU-scale work (:data:`_EXPENSIVE`).  Higher-order equations
    (pjit/pallas_call/custom_*) are treated opaquely — all their inputs are
    live if any output is.
    """
    live = {id(v) for v in outvars if not _is_literal(v)}
    expensive = False
    for eqn in reversed(jaxpr.eqns):
        if any(id(ov) in live for ov in eqn.outvars):
            if eqn.primitive.name in _EXPENSIVE:
                expensive = True
            for iv in eqn.invars:
                if not _is_literal(iv):
                    live.add(id(iv))
    return live, expensive


def extract_dependencies(
    block_fn: Callable,
    params,
    *example_args,
    input_arg_index: int = 0,
    exclude: Sequence[str] = (),
) -> List[Stage]:
    """Discover the stage schedule of ``block_fn(params, *example_args)``.

    ``block_fn`` must return the block's output array (or a pytree whose
    first leaf is it).  ``input_arg_index`` names which of ``example_args``
    is the block input activation.  ``exclude`` names 2-D params that are
    *not* quantization targets (e.g. the MoE router) — their dot_generals
    are treated as ordinary dataflow.  Returns linear stages in topological
    order plus a final ``Stage((OUTPUT,), release)`` sentinel.
    """
    leaves_with_path, _ = tree_flatten_with_path(params)
    closed = jax.make_jaxpr(lambda p, *a: block_fn(p, *a))(params, *example_args)
    jaxpr = closed.jaxpr

    n_params = len(leaves_with_path)
    weight_name: Dict[int, str] = {}  # id(var) -> layer name
    for (path, leaf), var in zip(leaves_with_path, jaxpr.invars[:n_params]):
        if hasattr(leaf, "ndim") and leaf.ndim == 2:
            name = _leaf_name(path)
            if name not in exclude:
                weight_name[id(var)] = name

    arg_leaves = []
    pos = n_params
    for i, a in enumerate(example_args):
        flat, _ = jax.tree_util.tree_flatten(a)
        if i == input_arg_index:
            input_vars = {id(jaxpr.invars[pos + j]) for j in range(len(flat))}
        pos += len(flat)
        arg_leaves.append(flat)

    # deps[id(var)] = frozenset of nearest upstream linear names (or INPUT)
    deps: Dict[int, FrozenSet[str]] = {v: frozenset({INPUT}) for v in input_vars}

    def var_deps(v) -> FrozenSet[str]:
        if type(v).__name__ == "Literal":
            return frozenset()
        return deps.get(id(v), frozenset())

    linear_order: List[str] = []
    linear_input_var: Dict[str, int] = {}
    direct_parents: Dict[str, FrozenSet[str]] = {}

    for eqn in jaxpr.eqns:
        in_deps = frozenset().union(*[var_deps(v) for v in eqn.invars]) if eqn.invars else frozenset()
        name = None
        if eqn.primitive.name == "dot_general":
            tagged = [weight_name.get(id(v)) for v in eqn.invars]
            hits = [t for t in tagged if t is not None]
            if len(hits) == 1:
                name = hits[0]
                act_idx = tagged.index(None)
                act_var = eqn.invars[act_idx]
                linear_order.append(name)
                linear_input_var[name] = id(act_var)
                direct_parents[name] = var_deps(act_var)
        for ov in eqn.outvars:
            if name is not None:
                deps[id(ov)] = frozenset({name})  # dataflow stops at a linear
            else:
                deps[id(ov)] = in_deps
            if eqn.primitive.name in _PASSTHROUGH and len(eqn.invars) == 1:
                w = weight_name.get(id(eqn.invars[0]))
                if w is not None:
                    weight_name[id(ov)] = w

    direct_parents[OUTPUT] = var_deps(jaxpr.outvars[0])

    # Group linears by shared input var, ordered by first occurrence.
    stages: List[List[str]] = []
    var_to_stage: Dict[int, int] = {}
    for name in linear_order:
        v = linear_input_var[name]
        if v in var_to_stage:
            stages[var_to_stage[v]].append(name)
        else:
            var_to_stage[v] = len(stages)
            stages.append([name])

    # children(entity) = linears (or OUTPUT) whose direct parents include it.
    children: Dict[str, List[str]] = {INPUT: []}
    for name in linear_order:
        children[name] = []
    for child, parents in direct_parents.items():
        for p in parents:
            children.setdefault(p, []).append(child)

    # Release an entity at the earliest stage by which all its children have
    # had their Hessians computed (OUTPUT counts as the final sentinel stage).
    quantized: set = set()
    released: set = set()
    out: List[Stage] = []
    all_entities = [INPUT] + linear_order
    for stage in stages:
        quantized.update(stage)
        rel = [e for e in all_entities
               if e not in released
               and children.get(e)
               and all(c in quantized for c in children[e] if c != OUTPUT)
               and OUTPUT not in children[e]]
        released.update(rel)
        out.append(Stage(tuple(stage), tuple(rel),
                         tuple(sorted(direct_parents[stage[0]]))))
    final_rel = [e for e in all_entities if e not in released]
    out.append(Stage((OUTPUT,), tuple(final_rel),
                     tuple(sorted(direct_parents[OUTPUT]))))

    # Sanity: every linear reachable from the input (reference
    # model_utils.py:216-225 asserts the same).
    for name in linear_order:
        assert direct_parents[name], f"linear {name} unreachable from input"
    return out


def stage_waves(stage_list: Sequence[Stage]) -> List[List[Stage]]:
    """Group stages into **waves** of mutually independent stages.

    Every wave member's parents are quantized before the wave begins, so
    one block forward can capture every member's Hessian input at once and
    the per-stage solves within a wave commute (bit-identical to solving
    them one forward at a time).  Dense decoder blocks degenerate to
    singleton waves (``[q,k,v] → [o] → [gate,up] → [down]``); MoE blocks
    collapse their ``2E`` per-expert stages into two waves (all expert
    gate/up, then all expert down) — per-block forwards drop from
    ``2E + 2`` to 4.

    Waves are dependency levels: ``level(stage) = 1 + max(level of each
    parent's stage)`` (``INPUT`` at -1).  Level scheduling, not greedy
    adjacency — the jaxpr emits MoE stages interleaved per expert
    (gate/up₀, down₀, gate/up₁, ...), and reordering across levels is safe
    because every parent sits at a strictly lower level.
    """
    level_of: Dict[str, int] = {INPUT: -1}
    levels: List[int] = []
    for st in stage_list:
        lv = 1 + max(level_of[p] for p in st.parents)
        levels.append(lv)
        for name in st.linears:
            level_of[name] = lv
    waves: List[List[Stage]] = [[] for _ in range(max(levels) + 1)] if levels else []
    for st, lv in zip(stage_list, levels):
        waves[lv].append(st)
    return waves
