"""Tree topology search: NNI hill climbing on the fused likelihood.

The reference accelerates one PLF node update; the application it plugs
into is maximum-likelihood tree *search* (RAxML).  This module supplies a
compact version of that loop on top of the TPU engine:

* :func:`nni_neighbors` — all nearest-neighbour-interchange rearrangements
  of a rooted binary tree (each internal edge yields two alternative
  topologies),
* :func:`nni_search` — greedy hill climbing: evaluate all neighbours with
  the fused whole-tree kernel, keep the best, optionally re-optimise
  branch lengths (models/optimize.py) after each accepted move.

Scoring N neighbour topologies is embarrassingly parallel over trees and
pointwise over sites; each evaluation is one compiled traversal.  Note
topology changes change the compiled schedule, so evaluations group by
tree shape; PhyloModel caches compilation per shape.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..config import PLFConfig
from .phylo import PhyloModel
from .substitution import SubstitutionModel
from .tree import Tree, TreeNode

__all__ = ["nni_neighbors", "nni_search", "SearchResult"]


@dataclasses.dataclass
class SearchResult:
    tree: Tree
    log_likelihood: float
    accepted_moves: int
    evaluations: int


def _rebuild(tree: Tree, new_children) -> Tree:
    nodes = []
    for n in tree.nodes:
        ch = new_children.get(n.index, n.children)
        nodes.append(TreeNode(index=n.index, name=n.name, length=n.length,
                              children=tuple(ch)))
    return Tree(nodes=nodes, root=tree.root)


def nni_neighbors(tree: Tree) -> List[Tree]:
    """All NNI rearrangements of a rooted binary tree.

    For each internal edge (parent P -> internal child D with children
    (x, y)) and P's other child s, the two interchanges swap s with x or
    with y.  Branch lengths ride along with their subtrees.
    """
    parent_of = {}
    for n in tree.nodes:
        for c in n.children:
            parent_of[c] = n.index
    out: List[Tree] = []
    for d in tree.nodes:
        if d.is_leaf or d.index == tree.root:
            continue
        p_idx = parent_of[d.index]
        p = tree.nodes[p_idx]
        sibs = [c for c in p.children if c != d.index]
        if len(sibs) != 1:
            continue
        s = sibs[0]
        x, y = d.children
        # swap s <-> x
        out.append(_rebuild(tree, {
            p_idx: tuple(x if c == s else c for c in p.children),
            d.index: (s, y)}))
        # swap s <-> y
        out.append(_rebuild(tree, {
            p_idx: tuple(y if c == s else c for c in p.children),
            d.index: (x, s)}))
    return out


def nni_search(tree: Tree, model: SubstitutionModel, tip_states,
               wgt=None, alpha: Optional[float] = None,
               config: Optional[PLFConfig] = None, max_rounds: int = 10,
               optimize_lengths_every: int = 0,
               verbose: bool = False) -> SearchResult:
    """Greedy NNI hill climbing.

    Evaluates every NNI neighbour per round with the fused tree kernel
    and moves to the best strictly-improving topology until none improves
    or ``max_rounds`` is reached.  If ``optimize_lengths_every`` > 0,
    branch lengths are re-optimised (adam, models/optimize.py) after
    every that-many accepted moves.
    """

    def ll_of(t: Tree) -> float:
        pm = PhyloModel(t, model, tip_states, wgt=wgt, alpha=alpha,
                        config=config)
        return pm.log_likelihood().log_likelihood

    current = tree
    best_ll = ll_of(current)
    accepted = 0
    evals = 1
    for _ in range(max_rounds):
        improved = False
        best_move = None
        best_move_ll = best_ll
        for cand in nni_neighbors(current):
            ll = ll_of(cand)
            evals += 1
            if ll > best_move_ll + 1e-9:
                best_move_ll = ll
                best_move = cand
        if best_move is None:
            break
        current, best_ll = best_move, best_move_ll
        accepted += 1
        improved = True
        if verbose:
            print(f"NNI move {accepted}: ll={best_ll:.4f}")
        if optimize_lengths_every and accepted % optimize_lengths_every == 0:
            from .optimize import optimize_branch_lengths, tree_loglik_fn
            pm = PhyloModel(current, model, tip_states, wgt=wgt,
                            alpha=alpha, config=config)
            t_opt, _, ll_opt = optimize_branch_lengths(pm, steps=40)
            nodes = [TreeNode(n.index, n.name,
                              float(t_opt[n.index]) if n.index < len(t_opt)
                              else n.length, n.children)
                     for n in current.nodes]
            current = Tree(nodes=nodes, root=current.root)
            best_ll = ll_of(current)
        if not improved:
            break
    return SearchResult(tree=current, log_likelihood=best_ll,
                        accepted_moves=accepted, evaluations=evals)
