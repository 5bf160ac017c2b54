"""Lexically constrained beam search — TPU-native dynamic beam allocation.

Parity: ``fairseq/search.py:219-528`` (LexicallyConstrainedBeamSearch, the
Post & Vilar 2018 / Hu et al. 2019 algorithm) and
``fairseq/token_generation_constraints.py`` (pack/unpack, Ordered/Unordered
constraint states).

TPU-native design: fairseq tracks per-beam Python ``ConstraintState``
objects and loops over sentences/candidates on the host every step. Here
the whole state machine is fixed-shape arrays living inside the jitted
decode loop:

- the UNORDERED constraint trie becomes int32 tables: ``trans`` (N, V)
  child-node ids, per-node depth / terminal-constraint id, a (N, C)
  descendant bitmap for saturation checks, and a (N, P) root-path terminal
  list for fairseq's rewind bookkeeping;
- the ORDERED variant is a cursor into the concatenated constraint
  sequence with endpoint flags (ConstraintSequence parity incl. the
  state=-1 root semantics);
- per-beam state is (node, met-bitmap) / cursor, advanced vectorially for
  every candidate at once;
- fairseq's bank-striping sort (search.py:425-520: sort by (bank, score),
  dedup, round-robin stripes across banks) is reproduced with fixed-size
  pairwise comparisons — candidate pools are tens of entries, so an
  O(n^2) mask beats host round trips by orders of magnitude.

Documented simplification vs fairseq: constraints are single-count (each
phrase required once — duplicates in the constraint list are collapsed);
fairseq's Counter-based multiplicity is a rarely-used generalization.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

PAD, EOS = 1, 2
NEG_INF = -1e9


# ---------------------------------------------------------------------------
# packing (token_generation_constraints.py:41-108 parity)
# ---------------------------------------------------------------------------

def pack_constraints(batch_constraints: Sequence[Sequence[Sequence[int]]]
                     ) -> np.ndarray:
    """[[c1, c2, ...] per sentence] -> packed (B, L) int32: row =
    [num_constraints, c1 tokens, 0, c2 tokens, 0, ...]."""
    rows = []
    maxlen = 1
    for sent in batch_constraints:
        n = 1 + sum(len(c) + 1 for c in sent)
        maxlen = max(maxlen, n)
    for sent in batch_constraints:
        row = [len(sent)]
        for c in sent:
            row.extend(int(t) for t in c)
            row.append(0)
        row.extend([0] * (maxlen - len(row)))
        rows.append(row)
    return np.asarray(rows, np.int32)


def unpack_constraints(row: Sequence[int]) -> List[List[int]]:
    row = list(int(t) for t in row)
    out = []
    offset = 1
    for _ in range(row[0]):
        end = row.index(0, offset)
        out.append(row[offset:end])
        offset = end + 1
    return out


# ---------------------------------------------------------------------------
# table construction (host-side, once per batch)
# ---------------------------------------------------------------------------

class ConstraintTables:
    """Fixed-shape device tables for one batch of constraints."""

    def __init__(self, arrays: Dict[str, Any], representation: str,
                 num_c: int, num_edges: int, path_len: int):
        self.arrays = arrays
        self.representation = representation
        self.C = num_c          # max constraints per sentence
        self.E = num_edges      # max trie edges per sentence
        self.P = path_len       # max root-path terminals per node


def build_constraint_tables(packed: np.ndarray, vocab_size: int,
                            representation: str = "unordered"
                            ) -> ConstraintTables:
    """packed: (B, L) from pack_constraints. Builds per-sentence tables
    padded to common shapes."""
    batch = [unpack_constraints(r) for r in packed]
    # collapse duplicates (single-count simplification)
    batch = [[list(c) for i, c in enumerate(sent)
              if c and c not in [list(x) for x in sent[:i]]]
             for sent in batch]
    b = len(batch)

    if representation == "ordered":
        seqs, ends = [], []
        for sent in batch:
            seq, end = [], []
            for c in sent:
                seq.extend(c)
                end.extend([False] * (len(c) - 1) + [True])
            seqs.append(seq)
            ends.append(end)
        m = max((len(s) for s in seqs), default=1) or 1
        seq_arr = np.zeros((b, m), np.int32)
        end_arr = np.zeros((b, m), bool)
        total = np.zeros((b,), np.int32)
        ncons = np.zeros((b,), np.int32)
        for i, (s, e) in enumerate(zip(seqs, ends)):
            seq_arr[i, :len(s)] = s
            end_arr[i, :len(e)] = e
            total[i] = len(s)
            ncons[i] = sum(e)
        arrays = dict(seq=jnp.asarray(seq_arr), endpoints=jnp.asarray(end_arr),
                      total=jnp.asarray(total), ncons=jnp.asarray(ncons))
        return ConstraintTables(arrays, "ordered", int(ncons.max(initial=1)),
                                0, 0)

    # ---- unordered: tries ----
    tries = []
    for sent in batch:
        # nodes: 0 = root; node = (parent, token, depth, term_id)
        nodes = [dict(parent=-1, token=-1, depth=0, term=-1, children={})]
        for cid, c in enumerate(sent):
            cur = 0
            for tok in c:
                nxt = nodes[cur]["children"].get(tok)
                if nxt is None:
                    nxt = len(nodes)
                    nodes.append(dict(parent=cur, token=tok,
                                      depth=nodes[cur]["depth"] + 1,
                                      term=-1, children={}))
                    nodes[cur]["children"][tok] = nxt
                cur = nxt
            nodes[cur]["term"] = cid
        tries.append(nodes)

    N = max((len(t) for t in tries), default=1)
    C = max((len(s) for s in batch), default=1) or 1
    E = max((sum(len(n["children"]) for n in t) for t in tries), default=1) or 1
    P = max((max((n["depth"] for n in t), default=1) for t in tries),
            default=1) or 1

    trans = np.full((b, N, vocab_size), -1, np.int32)
    depth = np.zeros((b, N), np.int32)
    anc1 = np.zeros((b, N), np.int32)       # depth-1 ancestor (0 at root)
    term = np.full((b, N), -1, np.int32)
    desc = np.zeros((b, N, C), bool)        # constraint ids in subtree
    path_term = np.full((b, N, P), -1, np.int32)  # terminals on root path,
    #                                               deepest first (rewind)
    edge_src = np.zeros((b, E), np.int32)
    edge_tok = np.zeros((b, E), np.int32)
    edge_valid = np.zeros((b, E), bool)
    clen = np.zeros((b, C), np.int32)
    ncons = np.zeros((b,), np.int32)
    total = np.zeros((b,), np.int32)

    for i, (sent, nodes) in enumerate(zip(batch, tries)):
        ncons[i] = len(sent)
        total[i] = sum(len(c) for c in sent)
        for cid, c in enumerate(sent):
            clen[i, cid] = len(c)
        e = 0
        for nid, nd in enumerate(nodes):
            depth[i, nid] = nd["depth"]
            term[i, nid] = nd["term"]
            for tok, ch in nd["children"].items():
                trans[i, nid, tok] = ch
                edge_src[i, e] = nid
                edge_tok[i, e] = tok
                edge_valid[i, e] = True
                e += 1
        # descendant constraint sets + root-path terminals (deepest first)
        def collect(nid):
            s = set()
            if nodes[nid]["term"] >= 0:
                s.add(nodes[nid]["term"])
            for ch in nodes[nid]["children"].values():
                s |= collect(ch)
            for cid in s:
                desc[i, nid, cid] = True
            return s
        collect(0)
        for nid, nd in enumerate(nodes):
            path = []
            cur = nid
            while cur > 0:
                if nodes[cur]["term"] >= 0:
                    path.append(nodes[cur]["term"])
                if nodes[cur]["parent"] == 0:
                    anc1[i, nid] = cur
                cur = nodes[cur]["parent"]
            path_term[i, nid, :len(path)] = path

    arrays = dict(trans=jnp.asarray(trans), depth=jnp.asarray(depth),
                  anc1=jnp.asarray(anc1),
                  term=jnp.asarray(term), desc=jnp.asarray(desc),
                  path_term=jnp.asarray(path_term),
                  edge_src=jnp.asarray(edge_src),
                  edge_tok=jnp.asarray(edge_tok),
                  edge_valid=jnp.asarray(edge_valid),
                  clen=jnp.asarray(clen), ncons=jnp.asarray(ncons),
                  total=jnp.asarray(total))
    return ConstraintTables(arrays, "unordered", C, E, P)


# ---------------------------------------------------------------------------
# jitted state machine (per sentence; vmapped over the batch)
# ---------------------------------------------------------------------------

def _advance_unordered(tb, node, met, token):
    """One UnorderedConstraintState.advance (tokgen_constraints.py:298-370)
    for scalar node/token + (C,) met bitmap. Returns (node', met')."""
    child = tb["trans"][node, token]
    rootchild = tb["trans"][0, token]

    # fairseq's saturation test is `generated[c] < c.num_constraints`
    # where `generated` counts completed-constraint paths AND the current
    # path (tokgen_constraints.py:347-353, rewind keeps the completed
    # path's counts). With single-count constraints:
    #   generated[c] = #met constraints under c + [c on the current path]
    def generated(n, on_path):
        d = tb["desc"][jnp.maximum(n, 0)]
        met_count = jnp.sum(d & met)
        num = jnp.sum(d)
        return (met_count + on_path.astype(jnp.int32) < num) & (num > 0)

    # a descend target is strictly below `node`, never on the path
    child_ok = (child >= 0) & generated(child, jnp.asarray(False))
    # a root child IS on the current path iff it's node's depth-1 ancestor
    on_path = (rootchild == tb["anc1"][node]) & (node > 0)
    root_ok = (rootchild >= 0) & generated(rootchild, on_path)

    # rewind bookkeeping (":330-345"): falling off the trie completes the
    # deepest unmet terminal on the old node's root path
    path = tb["path_term"][node]                      # (P,) deepest first
    unmet = (path >= 0) & ~met[jnp.maximum(path, 0)]
    first = jnp.argmax(unmet)                         # deepest unmet
    complete_id = jnp.where(jnp.any(unmet), path[first], -1)
    met_rewind = jnp.where(
        (jnp.arange(met.shape[0]) == complete_id) & (complete_id >= 0),
        True, met)

    new_node = jnp.where(child_ok, child,
                         jnp.where(root_ok, rootchild, 0))
    new_met = jnp.where(child_ok, met, met_rewind)
    return new_node, new_met


def _state_unordered(tb, node, met):
    """(bank, finished) for (node, met)."""
    bank = jnp.sum(tb["clen"] * met) + tb["depth"][node]
    in_final = (tb["term"][node] >= 0) & ~met[jnp.maximum(tb["term"][node], 0)]
    n_completed = jnp.sum(met) + in_final
    finished = n_completed >= tb["ncons"]
    return bank, finished


def _advance_ordered(tb, state, token):
    """OrderedConstraintState.advance (:463-506). state: -1 = root."""
    m = tb["total"]
    finished = (state + 1) >= m
    nxt = tb["seq"][jnp.clip(state + 1, 0, tb["seq"].shape[0] - 1)]
    match = (~finished) & (token == nxt)
    # endpoints[self.state]: python -1 indexing at root -> LAST endpoint,
    # which is True for any nonempty constraint set -> root stays root
    at_end = jnp.where(state < 0,
                       m > 0,
                       tb["endpoints"][jnp.clip(state, 0, None)])
    restart = token == tb["seq"][0]
    new_state = jnp.where(
        finished, state,
        jnp.where(match, state + 1,
                  jnp.where(at_end, state,
                            jnp.where(restart, 0, -1))))
    return new_state


def _step_constrained_sentence(tb, representation, k, vocab,
                               lprobs, alive_scores, cnode, cmet):
    """One sentence's constrained step (search.py:272-528).

    lprobs (K, V) step log-probs; alive_scores (K,) cumulative;
    cnode (K,) trie node / ordered cursor; cmet (K, C) met bitmap
    (unused for ordered). Returns 2K-candidate arrays:
    (scores, tokens, beams, node', met').
    """
    K, V = lprobs.shape

    if representation == "unordered":
        bank_fn = lambda n, mt: _state_unordered(tb, n, mt)
        adv_fn = lambda n, mt, t: _advance_unordered(tb, n, mt, t)
        E = tb["edge_src"].shape[0]
    else:
        bank_fn = lambda n, mt: (jnp.asarray(n + 1, jnp.int32),
                                 (n + 1) >= tb["total"])
        adv_fn = lambda n, mt, t: (_advance_ordered(tb, n, t), mt)
        E = tb["seq"].shape[0]  # candidate "edges": restart + next token

    # STEP 0: ban EOS for unfinished beams
    _, fin = jax.vmap(bank_fn)(cnode, cmet)
    cum = alive_scores[:, None] + lprobs
    cum = cum.at[:, EOS].add(jnp.where(fin, 0.0, NEG_INF))
    cum = cum.at[:, PAD].set(NEG_INF)

    # candidate pool: top-2K global + top-1 per beam + constraint tokens
    top2k_s, top2k_i = jax.lax.top_k(cum.reshape(-1), 2 * K)
    pool_beam = [top2k_i // V]
    pool_tok = [top2k_i % V]
    pool_score = [top2k_s]
    t1_s, t1_i = jax.lax.top_k(cum, 1)                   # (K,1)
    pool_beam.append(jnp.arange(K, dtype=top2k_i.dtype))
    pool_tok.append(t1_i[:, 0])
    pool_score.append(t1_s[:, 0])
    if representation == "unordered":
        # edges out of each beam's node or the root (next_tokens())
        src = tb["edge_src"][None, :]                    # (1,E)
        ok = tb["edge_valid"][None, :] & (
            (src == cnode[:, None]) | (src == 0))        # (K,E)
        toks = jnp.broadcast_to(tb["edge_tok"][None, :], (K, E))
        beams = jnp.broadcast_to(jnp.arange(K)[:, None], (K, E))
        sc = jnp.take_along_axis(cum, toks, axis=1)
        sc = jnp.where(ok, sc, NEG_INF)
    else:
        # ordered next_tokens(): seq[state+1] (+ seq[0] restart when >0)
        nxt = tb["seq"][jnp.clip(cnode + 1, 0, E - 1)]   # (K,)
        toks = jnp.stack([nxt, jnp.broadcast_to(tb["seq"][0], nxt.shape)], 1)
        ok = jnp.stack([(cnode + 1) < tb["total"],
                        cnode > 0], 1)                   # (K,2)
        beams = jnp.broadcast_to(jnp.arange(K)[:, None], (K, 2))
        sc = jnp.take_along_axis(cum, toks, axis=1)
        sc = jnp.where(ok, sc, NEG_INF)
    pool_beam.append(beams.reshape(-1))
    pool_tok.append(toks.reshape(-1))
    pool_score.append(sc.reshape(-1))

    beams = jnp.concatenate([b.astype(jnp.int32) for b in pool_beam])
    toks = jnp.concatenate([t.astype(jnp.int32) for t in pool_tok])
    scores = jnp.concatenate(pool_score)
    n = beams.shape[0]

    # advance every candidate; compute bank
    nodes_c = cnode[beams]
    met_c = cmet[beams]
    new_node, new_met = jax.vmap(lambda nn, mm, tt: adv_fn(nn, mm, tt))(
        nodes_c, met_c, toks)
    banks, _ = jax.vmap(bank_fn)(new_node, new_met)
    # EOS/dead candidates keep their pre-advance state (terminal anyway)
    valid = scores > NEG_INF / 2
    banks = jnp.where(valid, banks, -1)

    # dedup (beam, token): keep the first occurrence in pool order
    key = beams * (vocab + 1) + toks
    dup = (key[None, :] == key[:, None]) & (
        jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    is_dup = jnp.any(dup, axis=1)
    scores = jnp.where(is_dup, NEG_INF, scores)
    banks = jnp.where(is_dup, -1, banks)

    # sort by (bank desc, score desc) — search.py:440-446; lexsort's LAST
    # key is primary
    tot = jnp.maximum(tb["total"], 1).astype(jnp.float32)
    order = jnp.lexsort((-scores, -banks))
    scores, banks = scores[order], banks[order]
    beams, toks = beams[order], toks[order]
    new_node, new_met = new_node[order], new_met[order]

    # stripes (search.py:483-513): rank within bank, round-robin
    same = (banks[None, :] == banks[:, None]) & (
        jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    rank = jnp.sum(same, axis=1)
    stripes = (tot - banks.astype(jnp.float32)) + rank.astype(jnp.float32) \
        * (n + 1)
    stripes = jnp.where(scores > NEG_INF / 2, stripes, jnp.inf)
    order2 = jnp.argsort(stripes)[: 2 * K]
    return (scores[order2], toks[order2], beams[order2],
            new_node[order2], new_met[order2])


def step_lexically_constrained(tables: ConstraintTables, k: int, vocab: int,
                               lprobs, alive_scores, cnode, cmet):
    """Batched constrained step: lprobs (B, K, V), alive_scores (B, K),
    cnode (B, K), cmet (B, K, C) -> 2K candidates + new states."""
    fn = lambda tb_arrays, lp, sc, nd, mt: _step_constrained_sentence(
        tb_arrays, tables.representation, k, vocab, lp, sc, nd, mt)
    return jax.vmap(fn)(tables.arrays, lprobs, alive_scores, cnode, cmet)


def init_constraint_state(tables: ConstraintTables, b: int, k: int):
    """Root state for every beam."""
    if tables.representation == "ordered":
        node0 = jnp.full((b, k), -1, jnp.int32)
    else:
        node0 = jnp.zeros((b, k), jnp.int32)
    met0 = jnp.zeros((b, k, tables.C), bool)
    return node0, met0


def constraints_finished(tables: ConstraintTables, cnode, cmet):
    """(B, K) bool: may this beam emit EOS?"""
    if tables.representation == "ordered":
        return (cnode + 1) >= tables.arrays["total"][:, None]
    fn = lambda tb, n, mt: jax.vmap(
        lambda nn, mm: _state_unordered(tb, nn, mm)[1])(n, mt)
    return jax.vmap(fn)(tables.arrays, cnode, cmet)
