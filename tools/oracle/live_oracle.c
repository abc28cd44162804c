/* Golden-dump harness: CHUNKED (live/streaming) decode.
 *
 * Usage:
 *   live_oracle <modeldir> <rawfile> <outdir> <align_text> <chunk_samps>
 *
 * Runs decoder_process_int16(chunk, no_search=FALSE, full_utt=FALSE)
 * over fixed-size chunks — the reference's live path (chunked fe
 * overflow stitching, circular feat buffer, live CMN) — and dumps the
 * resulting word segs and two-pass alignment JSON.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <soundswallower/decoder.h>
#include <soundswallower/configuration.h>

static int16 *
read_file(const char *path, size_t *len)
{
    FILE *fh = fopen(path, "rb");
    int16 *buf;
    if (fh == NULL) { perror(path); exit(1); }
    fseek(fh, 0, SEEK_END);
    *len = ftell(fh);
    fseek(fh, 0, SEEK_SET);
    buf = malloc(*len);
    if (fread(buf, 1, *len, fh) != *len) { perror("read"); exit(1); }
    fclose(fh);
    return buf;
}

int
main(int argc, char *argv[])
{
    char path[4096], json[4096];
    config_t *config;
    decoder_t *d;
    int16 *raw;
    size_t raw_len, n_samps, pos;
    int chunk;
    FILE *out;
    seg_iter_t *seg;
    const char *jsonres;

    if (argc < 6) {
        fprintf(stderr,
                "usage: %s <modeldir> <rawfile> <outdir> <text> <chunk>\n",
                argv[0]);
        return 1;
    }
    snprintf(json, sizeof(json), "{\"hmm\": \"%s\"}", argv[1]);
    config = config_parse_json(NULL, json);
    d = decoder_init(config);
    if (d == NULL) { fprintf(stderr, "decoder_init failed\n"); return 1; }
    if (decoder_set_align_text(d, argv[4]) < 0) {
        fprintf(stderr, "set_align_text failed\n");
        return 1;
    }
    raw = read_file(argv[2], &raw_len);
    n_samps = raw_len / 2;
    chunk = atoi(argv[5]);

    decoder_start_utt(d);
    for (pos = 0; pos < n_samps; pos += chunk) {
        size_t n = n_samps - pos < (size_t)chunk ? n_samps - pos : (size_t)chunk;
        if (decoder_process_int16(d, raw + pos, n, FALSE, FALSE) < 0) {
            fprintf(stderr, "process failed at %zu\n", pos);
            return 1;
        }
    }
    decoder_end_utt(d);

    snprintf(path, sizeof(path), "%s/segs.txt", argv[3]);
    out = fopen(path, "w");
    for (seg = decoder_seg_iter(d); seg; seg = seg_iter_next(seg)) {
        int sf, ef;
        int32 ascr, lscr;
        seg_iter_frames(seg, &sf, &ef);
        seg_iter_prob(seg, &ascr, &lscr);
        fprintf(out, "%s %d %d %d %d\n", seg_iter_word(seg), sf, ef,
                ascr, lscr);
    }
    fclose(out);

    jsonres = decoder_result_json(d, 0.0, 2);
    snprintf(path, sizeof(path), "%s/result.json", argv[3]);
    out = fopen(path, "w");
    if (jsonres) fputs(jsonres, out);
    fclose(out);
    printf("hyp: %s\n", decoder_hyp(d, NULL));
    decoder_free(d);
    free(raw);
    return 0;
}
