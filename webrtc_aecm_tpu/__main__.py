"""`python -m webrtc_aecm_tpu far.wav near.wav` — the demo CLI."""
from .utils.cli import main

raise SystemExit(main())
