"""User-defined named MPO expectations collected per time step.

Reference ``renormalizer/property/property.py:4-80``.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

from typing import Dict, List, Union

from renormalizer_tpu.mps import MpDm, Mpo, Mps


class Property:
    """Stores property MPOs and their per-step expectation results.

    Attach to any :class:`TdMpsJob` (see :class:`ThermalProp`) to collect
    additional observables during a time-dependent simulation.
    """

    def __init__(self, prop_strs: List[str], prop_mpos: Dict[str, Mpo]):
        self.prop_strs = prop_strs
        self.prop_mpos = prop_mpos
        self.prop_res = {s: [] for s in prop_strs}

    def calc_properties_braketpair(self, pair):
        bra, ket = pair.bra_mps, pair.ket_mps
        for prop_str in self.prop_strs:
            mpo = self.prop_mpos[prop_str]
            if prop_str in ("x", "x^2", "n"):
                # diagonal observables on both bra and ket
                res = []
                if isinstance(mpo, Mpo):
                    res.append(bra.expectation(mpo, None))
                    res.append(ket.expectation(mpo, None))
                elif isinstance(mpo, list):
                    res.append(bra.expectations(mpo))
                    res.append(ket.expectations(mpo))
                self.prop_res[prop_str].append(res)
            else:
                # transition amplitude <bra|op|ket>
                self.prop_res[prop_str].append(ket.expectation(mpo, bra))

    def calc_properties(self, mps: Union[Mps, MpDm], mps_conj=None):
        for prop_str in self.prop_strs:
            if prop_str == "e_rdm":
                self.prop_res[prop_str].append(mps.calc_edof_rdm())
            elif prop_str in self.prop_mpos:
                mpo = self.prop_mpos[prop_str]
                if isinstance(mpo, Mpo):
                    self.prop_res[prop_str].append(mps.expectation(mpo, mps_conj))
                elif isinstance(mpo, list):
                    assert mps_conj is None
                    self.prop_res[prop_str].append(mps.expectations(mpo))
                else:
                    raise AssertionError
            else:
                raise NotImplementedError
