"""Counter-addressed stream policy shared by every engine (leaf module — no deps).

Seed-space stride between independent stream owners (devices / path blocks).
Each owner may use up to SEED_STRIDE Pallas block-programs without collision
(16384 programs x 1024 lanes = 16.7M paths per dispatch), and int32 seed
arithmetic stays wrap-free for 2^31/SEED_STRIDE = 131072 owners
(x 262144-path blocks ≈ 3.4e10 total paths).

Changing SEED_STRIDE changes every stream; checkpoints in flight would break
(CLAUDE.md conventions).
"""

SEED_STRIDE = 1 << 14
