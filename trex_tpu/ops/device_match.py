"""On-device optimal fish<->blob assignment for the tracking scan.

The host matchers (track/matching.py, mirroring the reference's
Match::PairingGraph, tracking/PairingGraph.cpp:1017-1275) solve a
max-weight bipartite matching per connected clique: maximize the sum
of p over edges with p > match_min_probability; a fish may stay
unassigned when that increases the total (all weights are positive,
so optima are maximal but not necessarily maximum-cardinality).
Per-clique optima compose to the global optimum, so the device solves
the WHOLE frame at once with a vectorized forward auction (Bertsekas):
each round every unassigned fish bids for its best net-value blob
(value - price), raising the price by its margin over its second-best
option (the dummy "stay unassigned" option has net value 0);
contested blobs go to the highest bidder. That maps onto dense (F, B)
VPU ops instead of the host's per-clique Kuhn-Munkres, and terminates
with an assignment within n*eps of the optimum
(eps-complementary-slackness).

Parity with the host is certified per frame, in the same
defer-marginal-frames-to-the-host pattern as ops/device_split:

- an EXACT primal-dual gap (mu_i = clamped best net value, prices on
  matched blobs; any feasible dual bounds OPT from above) certifies
  the auction found the optimum up to GAP_GUARD;
- ties between DIFFERENT optima are what make the host's answer
  depend on its tie-break (tree enumeration order for small cliques,
  integer-quantized Kuhn-Munkres for large ones — PairingGraph.cpp
  scales p by 1e7 to ints). Alternative matchings differ from ours by
  disjoint alternating cycles/paths, whose sum change telescopes
  through the dual to boundary terms minus the added edges' slacks —
  so a near-tie requires a chain of TIGHT (slack <= TIE_GUARD) edges
  with cancelling boundary duals. The device builds the fish->fish
  tight-step matrix, closes it by boolean squaring, and flags the
  frame when any cycle or boundary-cancelling path exists (arbitrary
  chain length, not just 1-swaps). Eps-crawling bidding wars (the
  auction signature of near-ties) hit the iteration cap, which also
  flags;
- edges whose probability sits within EDGE_GUARD of
  match_min_probability flag (the f32 edge set could differ from the
  host's f64 edge set).

Flagged frames are replayed by the host engine
(track/device_engine.DeviceTracker), so device/host parity holds
unconditionally; the guards only set the deferral RATE, which the
fuzz tests measure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e9)
EPS_BID = 1e-6       # auction eps: final matching within n*eps of OPT
ITER_CAP = 512       # bidding rounds; crawls (= near-ties) flag
GAP_GUARD = 1e-3     # exact dual-gap certificate threshold
TIE_GUARD = 1e-4     # 1-swap alternative within this of OPT -> host
EDGE_GUARD = 1e-6    # |p - p_min| boundary band -> host


def auction_match(Pmat: jax.Array, edge_ok: jax.Array,
                  eps: float = EPS_BID, iter_cap: int = ITER_CAP,
                  gap_guard: float = GAP_GUARD,
                  tie_guard: float = TIE_GUARD):
    """Optimal assignment of fish rows to blob columns.

    Pmat: (F, B) f32 probabilities; edge_ok: (F, B) bool — edges the
    host would consider (p > p_min, fish usable, blob valid).

    Returns (fob (B,) int32 fish-of-blob or -1, marginal bool scalar).
    When `marginal` is False the assignment equals the host matcher's
    (same optimum, unique within TIE_GUARD); when True the caller must
    defer the frame to the host.
    """
    F, B = Pmat.shape
    V = jnp.where(edge_ok, Pmat, NEG)
    fish_has_edge = jnp.any(edge_ok, axis=1)
    eps = jnp.float32(eps)

    def cond(st):
        price, owner, out, it = st
        oof = _owner_of_fish(owner, F)
        return jnp.any(~out & (oof < 0) & fish_has_edge) \
            & (it < iter_cap)

    def body(st):
        price, owner, out, it = st
        oof = _owner_of_fish(owner, F)
        bidder = ~out & (oof < 0) & fish_has_edge
        net = V - price[None, :]
        best = jnp.max(net, axis=1)
        jbest = jnp.argmax(net, axis=1)
        net2 = jnp.where(jnp.arange(B)[None, :] == jbest[:, None],
                         NEG, net)
        second = jnp.maximum(jnp.max(net2, axis=1), 0.0)  # dummy = 0
        goes_out = bidder & (best <= 0)
        out = out | goes_out
        bids = bidder & (best > 0)
        incr = best - second + eps
        bidmat = jnp.where(
            bids[:, None] & (jnp.arange(B)[None, :] == jbest[:, None]),
            incr[:, None], NEG)
        top = jnp.max(bidmat, axis=0)
        winner = jnp.argmax(bidmat, axis=0).astype(jnp.int32)
        won = top > NEG * 0.5
        price = jnp.where(won, price + top, price)
        owner = jnp.where(won, winner, owner)
        return price, owner, out, it + 1

    st0 = (jnp.zeros(B, jnp.float32), jnp.full(B, -1, jnp.int32),
           ~fish_has_edge, jnp.asarray(0, jnp.int32))
    price, owner, out, it = jax.lax.while_loop(cond, body, st0)
    cap_hit = cond((price, owner, out, jnp.asarray(0, jnp.int32)))
    # ^ bidders remain => iteration cap was hit (eps-crawl / near-tie)

    matched_b = owner >= 0
    fob = jnp.where(matched_b, owner, -1).astype(jnp.int32)
    # The certificate + tie detection run under a data-dependent cond:
    # a cap-hit frame is already marginal, and the cond boundary keeps
    # XLA's loop optimizer from sinking these fusions (incl. the
    # reachability-closure matmuls) into the auction while's body,
    # which would re-run them once per bidding round.
    marginal = jax.lax.cond(
        cap_hit, lambda: jnp.bool_(True),
        lambda: _certify(V, price, owner, matched_b, fish_has_edge,
                         edge_ok, gap_guard, tie_guard))
    return fob, marginal


def _certify(V, price, owner, matched_b, fish_has_edge, edge_ok,
             gap_guard, tie_guard):
    """Exact duality-gap certificate + alternating-structure tie
    detection for a converged auction. Returns the marginal flag."""
    F, B = V.shape
    own_safe = jnp.where(matched_b, owner, 0)
    v_matched = jnp.where(matched_b,
                          V[own_safe, jnp.arange(B)], 0.0)
    primal = jnp.sum(v_matched)

    # exact dual certificate: mu from the auction prices (feasible by
    # construction), prices counted on matched blobs; unmatched-blob
    # prices replaced by the minimal feasible value given mu
    mu = jnp.maximum(jnp.max(V - price[None, :], axis=1), 0.0)
    mu = jnp.where(fish_has_edge, mu, 0.0)
    pi_unmatched = jnp.maximum(jnp.max(V - mu[:, None], axis=0), 0.0)
    dual = jnp.sum(mu) + jnp.sum(jnp.where(matched_b, price,
                                           pi_unmatched))
    marginal = dual - primal > gap_guard

    # --- tie detection: tight-arc alternating reachability ---------------
    # An alternative matching differs from ours by disjoint alternating
    # cycles/paths. Writing each edge value through the dual
    # (v = mu_f + pi_b - slack; matched slacks ~ 0 by eps-CS), interior
    # node duals telescope away, so the sum change of applying a
    # component is
    #     delta = [gain-boundary duals] - [loss-boundary duals]
    #             - sum(slack over added edges).
    # Ours is optimal, so delta <= 0 (mod eps); a TIE needs every added
    # edge TIGHT (slack <= guard) and the boundary duals to cancel.
    # Encode tight alternating structure as a fish->fish step: fish f
    # moves along a tight unmatched edge to blob b, displacing b's
    # matched fish f' (A[f, f']). Boolean closure of A enumerates
    # arbitrary-length chains; the endpoint conditions below select the
    # component types (PairingGraph's tie-break would then decide, so
    # the frame defers to the host).
    oof = _owner_of_fish(owner, F)            # (F,) blob of fish or -1
    f_assigned = oof >= 0
    blob_of = jnp.where(f_assigned, oof, 0)
    f_free = fish_has_edge & ~f_assigned
    pi = jnp.where(matched_b, price, pi_unmatched)         # (B,)
    slack = mu[:, None] + pi[None, :] - V                  # (F, B)
    own_col = (jnp.arange(B)[None, :] == jnp.where(
        f_assigned, oof, -1)[:, None])                     # (F, B)
    tight = edge_ok & ~own_col & (slack <= tie_guard)      # added edges
    # fish -> fish step through a tight edge into a matched blob
    A = jnp.take(tight & matched_b[None, :], blob_of, axis=1) \
        & f_assigned[None, :]
    A = A & (jnp.arange(F)[:, None] != jnp.arange(F)[None, :])
    # transitive closure by squaring (paths up to length F)
    reach = A
    for _ in range(_n_squarings(F)):
        rf = reach.astype(jnp.float32)
        reach = reach | ((rf @ rf) > 0.5)
    step_or_reach = A | reach
    # (1) alternating cycle: any f reaches itself
    marginal = marginal | jnp.any(jnp.diagonal(reach))
    # fish -> unmatched blob endpoints: reach f' then a tight edge to
    # an unmatched blob, or directly
    t_un = tight & ~matched_b[None, :]                     # (F, B)
    reach_fb = t_un | ((step_or_reach.astype(jnp.float32)
                        @ t_un.astype(jnp.float32)) > 0.5)
    # (2) augmenting: free fish -> free blob; delta = mu_f + pi'_b - s
    end_b = pi_unmatched <= tie_guard
    marginal = marginal | jnp.any(
        (f_free & (mu <= tie_guard))[:, None]
        & reach_fb & (~matched_b & end_b)[None, :])
    # (3) re-route: covered fish f0 (its blob b0 freed) -> free blob;
    #     delta = pi'_bk - pi_b0 - sum(s)
    pi_b0 = jnp.where(f_assigned, pi[blob_of], NEG)        # (F,)
    cancel = jnp.abs(pi_unmatched[None, :] - pi_b0[:, None]) \
        <= tie_guard
    marginal = marginal | jnp.any(
        f_assigned[:, None] & reach_fb & ~matched_b[None, :] & cancel)
    # (4) displacement chain ending with a fish dropping to the dummy:
    #     free f0 -> fk (covered, mu_fk ~ 0)
    drop_ok = f_assigned & (mu <= tie_guard)
    marginal = marginal | jnp.any(
        (f_free & (mu <= tie_guard))[:, None] & step_or_reach
        & drop_ok[None, :])
    # (5) rotation: covered f0 (pi_b0 ~ 0) -> fk drops (mu_fk ~ 0)
    marginal = marginal | jnp.any(
        (f_assigned & (jnp.abs(pi_b0) <= tie_guard))[:, None]
        & step_or_reach & drop_ok[None, :])
    # (6) a free-free edge means the matching is not maximal (the
    #     optimum would include it) — flag categorically
    ff = f_free[:, None] & ~matched_b[None, :] & edge_ok
    marginal = marginal | jnp.any(ff)
    return marginal


def _n_squarings(F: int) -> int:
    n = 1
    k = 2
    while k < F:
        k *= 2
        n += 1
    return n


def _owner_of_fish(owner: jax.Array, F: int) -> jax.Array:
    """(B,) blob->fish ownership -> (F,) fish->blob (or -1)."""
    B = owner.shape[0]
    slots = jnp.where(owner >= 0, owner, F)
    return jnp.full(F + 1, -1, jnp.int32).at[slots].set(
        jnp.arange(B, dtype=jnp.int32), mode="drop")[:F]


def edge_boundary_marginal(Pmat: jax.Array, usable_f: jax.Array,
                           valid_b: jax.Array, p_min: float,
                           guard: float = EDGE_GUARD,
                           p_err=None) -> jax.Array:
    """True when any candidate edge sits within `guard` of the p_min
    edge-inclusion boundary (f32 vs host-f64 edge sets could differ).

    `p_err` (optional (F, B)) widens the band per edge by a bound on
    |p_f32 - p_f64| over the same carry bits (device_tracker computes
    it from the decay-estimate error bound) — an edge is then never
    decided on-device when the host's f64 probability could sit on the
    other side of match_min_probability."""
    width = guard if p_err is None else guard + p_err
    band = jnp.abs(Pmat - p_min) <= width
    return jnp.any(band & usable_f[:, None] & valid_b[None, :])
