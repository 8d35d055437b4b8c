"""Ablation entry: no affective (ST-GCN) encoder.

Equivalent of reference `main_v2_abl_aff.py` — the generator consumes the
raw seed-pose sequence (pose_dim + 1 features) and the discriminator is the
plain ConvDiscriminator (net/multimodal_context_net_v2_abl_aff.py:285-439).
"""

from .main_v2 import main as _main


def main(argv=None):
    return _main(argv, variant="abl_aff")


if __name__ == "__main__":
    main()
