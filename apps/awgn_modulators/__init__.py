"""Example applications (reference apps/ counterpart)."""
