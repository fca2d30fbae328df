"""Code families ("models"): Polar and LDPC."""
