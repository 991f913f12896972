"""Legacy entry shim, parity with the reference's root run_stac.py:

    python run_stac.py stac=stac_synth_data model=synth_data
"""

from stac_mjx_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
