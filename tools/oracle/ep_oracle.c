/* Endpointer oracle: runs the reference endpointer over a raw int16
 * file and dumps, per input frame:
 *
 *   ep.f64   [n_frames x 4] float64 rows:
 *     {returned (0/1), in_speech (0/1), speech_start, speech_end}
 *
 * plus the concatenation of all returned speech frames to speech.i16.
 *
 * Usage: ep_oracle <rawfile> <rate> <mode> <window> <ratio> <outdir>
 */
#include <stdio.h>
#include <stdlib.h>
#include <soundswallower/endpointer.h>

int main(int argc, char *argv[]) {
    FILE *fh, *meta, *speech;
    char path[4096];
    short *data;
    long len, pos;
    int rate, mode;
    double window, ratio;
    endpointer_t *ep;
    size_t frame_size;

    if (argc != 7) {
        fprintf(stderr,
                "usage: %s <rawfile> <rate> <mode> <window> <ratio> <outdir>\n",
                argv[0]);
        return 1;
    }
    rate = atoi(argv[2]);
    mode = atoi(argv[3]);
    window = atof(argv[4]);
    ratio = atof(argv[5]);

    fh = fopen(argv[1], "rb");
    if (fh == NULL) { perror(argv[1]); return 1; }
    fseek(fh, 0, SEEK_END);
    len = ftell(fh) / 2;
    fseek(fh, 0, SEEK_SET);
    data = malloc(len * 2);
    if (fread(data, 2, len, fh) != (size_t)len) { perror("read"); return 1; }
    fclose(fh);

    ep = endpointer_init(window, ratio, (vad_mode_t)mode, rate, 0.0);
    if (ep == NULL) { fprintf(stderr, "endpointer_init failed\n"); return 1; }
    frame_size = endpointer_frame_size(ep);

    snprintf(path, sizeof(path), "%s/ep.f64", argv[6]);
    meta = fopen(path, "wb");
    snprintf(path, sizeof(path), "%s/speech.i16", argv[6]);
    speech = fopen(path, "wb");

    for (pos = 0; pos + (long)frame_size <= len; pos += frame_size) {
        const int16 *out = endpointer_process(ep, data + pos);
        double row[4];
        row[0] = out != NULL;
        row[1] = endpointer_in_speech(ep);
        row[2] = endpointer_speech_start(ep);
        row[3] = endpointer_speech_end(ep);
        fwrite(row, 8, 4, meta);
        if (out != NULL)
            fwrite(out, 2, frame_size, speech);
    }
    {
        size_t out_nsamp = 0;
        const int16 *out = endpointer_end_stream(ep, data + pos,
                                                 (size_t)(len - pos),
                                                 &out_nsamp);
        double row[4];
        row[0] = out != NULL ? (double)out_nsamp : 0.0;
        row[1] = endpointer_in_speech(ep);
        row[2] = endpointer_speech_start(ep);
        row[3] = endpointer_speech_end(ep);
        fwrite(row, 8, 4, meta);
        if (out != NULL)
            fwrite(out, 2, out_nsamp, speech);
    }
    fclose(meta);
    fclose(speech);
    free(data);
    return 0;
}
