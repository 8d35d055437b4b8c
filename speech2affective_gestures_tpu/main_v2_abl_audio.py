"""Ablation entry: raw-waveform audio encoder (WavEncoder) generator.

Equivalent of reference `main_v2_abl_audio.py` — identical to main_v2 except
the generator consumes raw audio through a WavEncoder instead of MFCCs
(net/multimodal_context_net_v2_abl_audio.py) and the work dir is suffixed.
"""

from .main_v2 import main as _main


def main(argv=None):
    return _main(argv, variant="abl_audio")


if __name__ == "__main__":
    main()
