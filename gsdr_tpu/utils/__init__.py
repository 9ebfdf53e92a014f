"""Support utilities: exact oscillator phase math, filter design, timing."""
