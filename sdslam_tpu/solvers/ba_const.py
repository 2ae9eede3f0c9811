"""Bundle-adjustment robust-kernel constants, shared by solvers/ba.py and
ops/pallas/ba_edge_kernel.py (a separate module to avoid a circular import).

Huber deltas are sqrt(5.991) / sqrt(7.815) — the 95% chi2 quantiles for 2/3
DoF the reference uses (Optimizer.cc:87-88)."""

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = 2.4477
HUBER_STEREO = 2.7955
FIXED_PRIOR = 1e12  # diagonal prior pinning fixed cameras
