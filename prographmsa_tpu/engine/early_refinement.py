"""Early refinement (--early_refinement).

Behavioral port of earlyRefinement (ProgressiveAlignment.h:115-243):
after aligning a node, re-align its up-to-4 grandchild subalignments
incrementally against the (reset) ancestor graph, then drop unused nodes.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .progressive import (ProgressiveAlignmentResult, align_graphs,
                          extend_alignment, extend_tr_homologies)
from ..align.merge import merge_graphs_incremental


def early_refinement(old_result, tree, factory, options, spec,
                     alignment_cache):
    if tree[0].is_leaf() and tree[1].is_leaf():
        return old_result

    old_results = []
    distances = []
    gap_distances = []
    for i in range(tree.n_children()):
        child = tree[i]
        if child.is_leaf():
            r = alignment_cache[id(child)]
            old_results.append(r)
            gap_distances.append(child.branch_length)
            distances.append(0.0 if r.is_csprofile else child.branch_length)
        else:
            parent = child
            assert parent.n_children() == 2
            for j in range(tree.n_children()):
                r = alignment_cache[id(parent[j])]
                old_results.append(r)
                gap_distances.append(parent.branch_length
                                     + parent[j].branch_length)
                d = parent.branch_length
                if not r.is_csprofile:
                    d += parent[j].branch_length
                distances.append(d)
    n_results = len(old_results)
    assert n_results >= 2

    result = ProgressiveAlignmentResult()
    result.score = old_result.score
    result.is_csprofile = False
    result.n_tr_indels = old_result.n_tr_indels

    mappings: List[List[int]] = [None] * n_results
    anc_graph = old_result.graph.copy()
    anc_graph.reset_sites()
    anc_mapping = list(range(anc_graph.size))

    for i in range(n_results):
        model = factory.get_model(distances[i], options, gap_distances[i])
        aln, _ = align_graphs(old_result.graph, old_results[i].graph, model,
                              options)
        mapping1 = [anc_mapping[m] if m != -1 else -1 for m in aln.mapping1]

        anc = merge_graphs_incremental(anc_graph, old_results[i].graph,
                                       mapping1, aln.mapping2, model)
        anc_graph = anc.graph
        mappings[i] = anc.mapping2

        inv_mapping = [-2] * anc_graph.size
        for j, m in enumerate(anc.mapping1):
            if m != -1:
                inv_mapping[m] = j
        anc_mapping = [inv_mapping[m] for m in anc_mapping]

        for j in range(i):
            new_mapping = []
            for k in range(anc_graph.size):
                mk = anc.mapping1[k]
                if mk != -1:
                    mk = mappings[j][mk]
                new_mapping.append(mk)
            mappings[j] = new_mapping

    # remove unused nodes (ProgressiveAlignment.h:201-230)
    i = 0
    while i < anc_graph.size:
        if any(mappings[j][i] != -1 for j in range(n_results)):
            i += 1
            continue
        j2 = i + 1
        removed = False
        while j2 < anc_graph.size:
            if any(mappings[k][j2] != -1 for k in range(n_results)):
                anc_graph.rm_nodes(i, j2 - i)
                for k in range(n_results):
                    del mappings[k][i:j2]
                removed = True
                break
            j2 += 1
        if not removed:
            i += 1

    result.graph = anc_graph
    for i in range(n_results):
        extend_alignment(result, mappings[i], old_results[i].aligned_sequences,
                         spec.gap_code)
        extend_tr_homologies(result, mappings[i],
                             old_results[i].tr_homologies,
                             old_results[i].tr_source)
    result.graph.add_repeats(result.tr_homologies)
    return result
