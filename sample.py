from scal_sdt_tpu.cli.sample import main

if __name__ == '__main__':
    import logging
    logging.basicConfig(level='INFO')
    main()
