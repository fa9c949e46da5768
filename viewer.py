"""`python viewer.py <model_path>` — interactive web viewer.

Analogue of /root/reference/viewer.py (viser server when available;
dependency-free HTTP orbit viewer otherwise).
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--background_color", nargs=3, type=float,
                    default=(0.0, 0.0, 0.0))
    ap.add_argument("--image_size", type=int, default=512)
    args = ap.parse_args()

    from gsl_tpu.viewer import Viewer
    Viewer(args.model_path, host=args.host, port=args.port,
           background=tuple(args.background_color),
           image_size=args.image_size).start()


if __name__ == "__main__":
    main()
