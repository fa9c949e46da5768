"""`python main.py fit|validate|test ...` — see gsl_tpu/cli.py.

Analogue of the reference /root/reference/main.py entrypoint.
"""
from gsl_tpu.cli import main

if __name__ == "__main__":
    main()
