"""Multi-chain, many-fragment assembler stress (VERDICT r3 #4).

The beam-search assembler + gap filler (trace/assemble.py, vs reference
modeler.py:1496-2123: beam collapse at 2026-2047, conflict resolution at
1850-1883) had only single-chain/small-multimer coverage.  This scenario
runs at real complexity: 4 chains / 820 total residues across two
sequence entries, one sequence DUPLICATED (chain-copy assignment), with
gapped/imperfect AF3 templates (coordinate jitter everywhere plus one
strongly displaced 20-residue segment).  Quality gates: per-chain
coverage, conflict-free candidate usage, and model-vs-truth CA accuracy
for the assigned positions.
"""

import numpy as np
import pytest

from mica_tpu.trace.af3_align import AF3Aligner
from mica_tpu.trace.align import TemplateFreeAligner
from mica_tpu.trace.assemble import Assembler
from mica_tpu.trace.candidates import extract_candidates
from mica_tpu.trace.types import ChainModel, SequenceEntry

from synthetic import AA_LETTERS, make_chain, make_multichain_volumes

SHAPE = (160, 160, 96)
N1, N2 = 250, 160  # entry 1 has 2 chain copies, entry 2 has 2 copies


@pytest.fixture(scope="module")
def scenario():
    rng = np.random.default_rng(5)
    seq1 = "".join(rng.choice(list(AA_LETTERS), size=N1))
    seq2 = "".join(rng.choice(list(AA_LETTERS), size=N2))
    # four chains in the four quadrants of the box; entry-1's two chains
    # are translated copies (identical structure = the chain-copy
    # assignment problem), entry-2's are independent folds
    ca1a = make_chain(N1, (80, 80, 96), seed=41)
    ca1b = ca1a + np.array([76.0, 0.0, 0.0])
    base2 = make_chain(N2, (80, 80, 96), seed=43)
    ca2c = base2 + np.array([0.0, 76.0, 0.0])
    # chain copies share a fold: D is a 90-degree-rotated rigid copy of C
    # (rotated-copy assignment is strictly harder than pure translation)
    ca2d = np.stack([base2[:, 1], 80.0 - base2[:, 0], base2[:, 2]],
                    axis=1) + np.array([76.0, 76.0, 0.0])
    vols = make_multichain_volumes(
        [(seq1, ca1a), (seq1, ca1b), (seq2, ca2c), (seq2, ca2d)], SHAPE)
    cands = extract_candidates(
        vols["carbon_alpha_probability"], vols["backbone_probability"],
        vols["amino_acid_probability"], vols["amino_acid_prediction"])
    return {
        "seq1": seq1, "seq2": seq2,
        "truth": {"A": ca1a, "B": ca1b, "C": ca2c, "D": ca2d},
        "vols": vols, "cands": cands, "rng": rng,
    }


def _entries(sc, with_af3: bool):
    rng = np.random.default_rng(9)
    if with_af3:
        # imperfect template: global jitter + one 20-residue segment
        # displaced 12 A (a mispredicted loop); rigidly shifted so the
        # aligner must solve the placement, not read it off
        t1 = sc["truth"]["A"] + rng.normal(scale=0.6, size=(N1, 3))
        t1[100:120] += np.array([12.0, -8.0, 5.0])
        t1 += np.array([200.0, -50.0, 30.0])
        t2 = sc["truth"]["C"] + rng.normal(scale=0.6, size=(N2, 3))
        t2[40:60] += np.array([-10.0, 9.0, 6.0])
        t2 += np.array([-80.0, 120.0, -40.0])
    else:
        t1 = t2 = None
    e1 = SequenceEntry(name="p1", sequence=sc["seq1"], af3_coords=t1)
    e1.chains["A"] = ChainModel(chain_id="A", length=N1)
    e1.chains["B"] = ChainModel(chain_id="B", length=N1)
    e2 = SequenceEntry(name="p2", sequence=sc["seq2"], af3_coords=t2)
    e2.chains["C"] = ChainModel(chain_id="C", length=N2)
    e2.chains["D"] = ChainModel(chain_id="D", length=N2)
    return [e1, e2]


def _gate(entries, sc, min_cov, max_med_err):
    cands = sc["cands"]
    used = {}
    report = {}
    for e in entries:
        n = len(e.sequence)
        for cid, chain in e.chains.items():
            res = chain.result
            assigned = res != -1
            cov = assigned.sum() / n
            # conflict-free: no candidate on two chains
            for seq_i, cand in enumerate(res):
                if cand == -1:
                    continue
                assert cand not in used, (
                    f"candidate {cand} on {used.get(cand)} and {cid}")
                used[cand] = cid
            # truth accuracy: assigned positions near the true CA of the
            # NEAREST chain copy (copies are interchangeable)
            got = cands.coords[res[assigned]]
            errs = []
            copies = [sc["truth"][c] for c in e.chains]
            for pos, xyz in zip(np.nonzero(assigned)[0], got):
                errs.append(min(np.linalg.norm(c[pos] - xyz) for c in copies))
            med = float(np.median(errs)) if errs else np.inf
            report[cid] = (round(float(cov), 3), round(med, 2))
            assert cov >= min_cov, (cid, cov, report)
            assert med <= max_med_err, (cid, med, report)
    return report


@pytest.mark.slow
def test_assembler_multichain_af3(scenario):
    entries = _entries(scenario, with_af3=True)
    aligner = AF3Aligner(entries, scenario["cands"],
                         scenario["vols"]["carbon_alpha_probability"])
    aligner.run()
    asm = Assembler(entries, scenario["cands"], aligner.seq_cand_aa_mat,
                    aligner.n_hop_mat, protocol="AF3_struct")
    asm.build_initial_model()
    asm.fill_gaps()
    report = _gate(entries, scenario, min_cov=0.6, max_med_err=2.5)
    # recorded gates (VERDICT r3 #4): print so the CI log carries them
    print("multichain AF3 gates (coverage, median err A):", report)


@pytest.mark.slow
def test_assembler_multichain_template_free(scenario):
    entries = _entries(scenario, with_af3=False)
    aligner = TemplateFreeAligner(entries, scenario["cands"])
    ok = aligner.run()
    assert ok
    asm = Assembler(entries, scenario["cands"], aligner.seq_cand_aa_mat,
                    aligner.n_hop_mat, protocol="AF3_struct_free")
    asm.build_initial_model()
    asm.fill_gaps()
    # template-free multimer assignment is the hard protocol — gates are
    # looser but still demand real coverage and correct geometry
    report = _gate(entries, scenario, min_cov=0.35, max_med_err=3.0)
    print("multichain template-free gates (coverage, median err A):", report)
