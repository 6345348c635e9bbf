from scal_sdt_tpu.cli.arb_debug import main

if __name__ == '__main__':
    import logging
    logging.basicConfig(level='INFO')
    main()
