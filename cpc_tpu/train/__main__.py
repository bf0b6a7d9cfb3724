from cpc_tpu.train.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
