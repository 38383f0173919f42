from .cvsr import CVSRV8, make_model
from ..config import ModelConfig


def _lazy(name):
    def build(cfg=None, **kw):
        from . import cvsr_variants as v

        if cfg is None:
            # SIDECVSR's reference ctor defaults to SCGs=4
            # (`SIDECVSR_our.py:4090`); V7/V9 hard-code 7 (`:4233,5036`)
            cfg = ModelConfig(name=name,
                              scn_groups=4 if name == "sidecvsr" else 7)
        return {"cvsr_v7": v.CVSRV7, "cvsr_v9": v.CVSRV9,
                "sidecvsr": v.SIDECVSRModel}[name](cfg, **kw)

    return build


# reference model zoo (arch/SIDECVSR_our.py top-level classes)
MODEL_REGISTRY = {
    "cvsr_v8": lambda cfg=None, **kw: CVSRV8(cfg or ModelConfig(), **kw),
    "cvsr_v8_wopab": lambda cfg=None, **kw: CVSRV8(
        cfg or ModelConfig(name="cvsr_v8_wopab", use_pab=False), **kw),
    "cvsr_v8_wola": lambda cfg=None, **kw: CVSRV8(
        cfg or ModelConfig(name="cvsr_v8_wola", use_la=False), **kw),
    "cvsr_v8_woga": lambda cfg=None, **kw: CVSRV8(
        cfg or ModelConfig(name="cvsr_v8_woga", use_ga=False), **kw),
    "cvsr_v8_womv": lambda cfg=None, **kw: CVSRV8(
        cfg or ModelConfig(name="cvsr_v8_womv", use_mv=False), **kw),
    "cvsr_v8_wopd": lambda cfg=None, **kw: CVSRV8(
        cfg or ModelConfig(name="cvsr_v8_wopd", use_pd=False), **kw),
    "cvsr_v7": _lazy("cvsr_v7"),
    "cvsr_v9": _lazy("cvsr_v9"),
    "sidecvsr": _lazy("sidecvsr"),
}


def build_model(name: str, cfg=None, **kw):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](cfg, **kw)


__all__ = ["CVSRV8", "make_model", "build_model", "MODEL_REGISTRY"]
