from . import primes  # noqa: F401
